/* Force-included before the reference sources: pre-claims the include guard
 * of StringHash.hpp (which does not compile on modern libstdc++ due to the
 * std::hash / __gnu_cxx::hash ambiguity) and provides an equivalent
 * string_hash based on std::unordered_map. */
#ifndef STRINGHASH_PREEMPT_H
#define STRINGHASH_PREEMPT_H
#define STRINGHASH_HPP_
#include <string>
#include <unordered_map>
template <class T>
class string_hash : public std::unordered_map<std::string, T> {};
#endif
