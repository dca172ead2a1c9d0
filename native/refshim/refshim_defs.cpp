/* Out-of-class definitions for the reference's in-class-initialized
 * static const members (MLAlignment.hpp:33-34).  convertAlignment
 * (DInDel.cpp) ODR-uses them (binds const refs) and modern g++ no
 * longer folds that away at -O2, so every driver that links DInDel.cpp
 * needs exactly one TU with these definitions. */
#include <iostream>
#include <string>
#include <map>
#include <vector>
using namespace std;
#include "MLAlignment.hpp"

const int MLAlignment::LO;
const int MLAlignment::RO;
