#ifndef BOOST_TUPLE_STUB_HPP
#define BOOST_TUPLE_STUB_HPP
#include <tuple>
namespace boost {
using std::tuple;
using std::make_tuple;
using std::get;
}
#endif
