/* Stub of the boost::program_options API surface needed to *compile* the
 * reference DInDel.cpp for differential testing (only getParameters
 * references it outside the #ifdef DINDEL main; nothing calls it at
 * runtime in the drivers — every accessor aborts). Not boost code. */
#ifndef BOOST_PROGRAM_OPTIONS_STUB_HPP
#define BOOST_PROGRAM_OPTIONS_STUB_HPP

#include <cstdlib>
#include <string>

namespace boost { namespace program_options {

class variable_value {
public:
    template <class T> T as() const { abort(); }
};

class variables_map {
public:
    const variable_value &operator[](const std::string &) const {
        static variable_value v;
        return v;
    }
    size_t count(const std::string &) const { return 0; }
};

}}  // namespace boost::program_options

#endif
