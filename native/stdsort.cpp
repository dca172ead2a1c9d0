// Reference-exact read ordering: DetInDel::getReads sorts the window's
// reads with std::sort and a strict mapQual comparator
// (/root/reference/DInDel.cpp:889-894,1218) — an UNSTABLE libstdc++
// introsort whose permutation of equal-mapQual reads (the common case:
// most reads share mapQual) determines the read order every downstream
// float fold sees.  Bit-identical GLF output therefore requires the
// exact same permutation.  std::sort's element moves depend only on the
// comparator outcomes and element positions, so running the same
// libstdc++ std::sort over (key, index) pairs with a key-only
// comparator reproduces the reference's permutation exactly.
//
// Build: g++ -O2 -shared -fPIC stdsort.cpp -o libdindel_stdsort.so
#include <algorithm>
#include <cstdint>
#include <vector>

namespace {
struct KV {
    double k;
    int32_t i;
};
}

extern "C" void dsort_mapqual_desc(int64_t n, const double *keys,
                                   int32_t *out) {
    std::vector<KV> v(static_cast<size_t>(n));
    for (int64_t i = 0; i < n; ++i) {
        v[i].k = keys[i];
        v[i].i = static_cast<int32_t>(i);
    }
    std::sort(v.begin(), v.end(),
              [](const KV &a, const KV &b) { return a.k > b.k; });
    for (int64_t i = 0; i < n; ++i)
        out[i] = v[i].i;
}
