/* Stub of BOOST_FOREACH using C++11 range-for. */
#ifndef BOOST_FOREACH_STUB_HPP
#define BOOST_FOREACH_STUB_HPP
#define BOOST_FOREACH(decl, container) for (decl : container)
#endif
