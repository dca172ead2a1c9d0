/* Affine-gap (Gotoh) global alignment used for haplotype<->reference
 * alignment and candidate left-alignment.
 *
 * Own implementation, written to be *behaviorally identical* to the
 * alignment the reference obtains from SeqAn 1.x globalAlignment(...,Gotoh)
 * (seqan_library/seqan/graph_align/graph_align_gotoh.h) with
 * AlignConfig<false,false,false,false>, including every tie-break:
 *   - vertical/horizontal gap: extension preferred on ties (strict '>' for
 *     the open candidate);
 *   - cell direction: Diagonal preferred over Vertical over Horizontal
 *     (each replaces only on strict '>');
 *   - final cell: Horizontal preferred, then Vertical, else Diagonal.
 *
 * Exposed via a C ABI for ctypes. Output is a segment string from the
 * alignment start: 'D' diagonal (consume both), 'H' gap in seq2 (consume
 * seq1), 'V' gap in seq1 (consume seq2), one char per consumed position.
 *
 * Build: g++ -O3 -shared -fPIC nw.cpp -o libdindel_native.so
 */
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

enum { DIAG = 0, HORIZ = 1, VERT = 2 };

struct Trace {
    // per cell: bit0-1 tvMat, bit2 horiz-open, bit3 vert-open
    std::vector<uint8_t> v;
    int rows;
    Trace(int len1, int len2) : v((size_t)len1 * len2, 0), rows(len2) {}
    uint8_t &at(int col, int row) { return v[(size_t)col * rows + row]; }
};

}  // namespace

extern "C" {

/* Aligns seq1 (length n1) vs seq2 (length n2). ops must have room for
 * n1+n2 chars (+1 NUL). Returns the alignment score. */
int64_t dindel_gotoh_align(const char *seq1, int32_t n1, const char *seq2,
                           int32_t n2, int32_t match, int32_t mismatch,
                           int32_t gap_extend, int32_t gap_open, char *ops,
                           int32_t *ops_len) {
    typedef int64_t S;
    const S GO = gap_open, GE = gap_extend;
    std::vector<S> mat(n2 + 1), hori(n2 + 1);
    Trace trace(n1 > 0 ? n1 : 1, n2 > 0 ? n2 : 1);

    mat[0] = 0;
    for (int row = 1; row <= n2; ++row) {
        mat[row] = GO + (S)(row - 1) * GE;
        hori[row] = mat[row] + GO - GE;
    }
    S vert = 0;
    int tvMat = DIAG;
    int initialDir = DIAG;
    for (int col = 1; col <= n1; ++col) {
        S diagValMat = mat[0];
        mat[0] = GO + (S)(col - 1) * GE;
        vert = mat[0] + GO - GE;
        for (int row = 1; row <= n2; ++row) {
            uint8_t tv = 0;
            // vertical: gap in seq1, consumes seq2
            S a = mat[row - 1] + GO;
            S b = vert + GE;
            if (a > b) { vert = a; tv |= 8; }
            else vert = b;
            // horizontal: gap in seq2, consumes seq1
            a = mat[row] + GO;
            b = hori[row] + GE;
            if (a > b) { hori[row] = a; tv |= 4; }
            else hori[row] = b;
            // diagonal cell
            S max_val = diagValMat + (seq1[col - 1] == seq2[row - 1] ? match : mismatch);
            tvMat = DIAG;
            if (vert > max_val) { max_val = vert; tvMat = VERT; }
            if (hori[row] > max_val) { max_val = hori[row]; tvMat = HORIZ; }
            tv |= (uint8_t)tvMat;
            diagValMat = mat[row];
            mat[row] = max_val;
            trace.at(col - 1, row - 1) = tv;
        }
    }
    // final-cell direction (graph_align_gotoh.h:256-260)
    initialDir = DIAG;
    if (n1 > 0 && n2 > 0) {
        if (hori[n2] == mat[n2]) initialDir = HORIZ;
        else if (vert == mat[n2]) initialDir = VERT;
    }
    S score = mat[n2];

    // traceback (port of _align_gotoh_trace, graph_align_gotoh.h:33-136)
    // emits (type, len) segments back-to-front; we expand to chars and
    // reverse at the end.
    std::vector<char> rev;
    rev.reserve(n1 + n2);
    int len1 = n1, len2 = n2;
    const char TC[3] = {'D', 'H', 'V'};
    auto emit = [&](int type, int seglen) {
        for (int i = 0; i < seglen; i++) rev.push_back(TC[type]);
    };
    if (len1 != 0 && len2 != 0) {
        uint8_t nextTraceValue = trace.at(len1 - 1, len2 - 1);
        int tv = DIAG;
        if (initialDir == DIAG) tv = nextTraceValue & 3;
        else if (initialDir == HORIZ) {
            if ((nextTraceValue >> 2) & 1) { --len1; emit(HORIZ, 1); }
            else tv = HORIZ;
        } else if (initialDir == VERT) {
            if ((nextTraceValue >> 3) & 1) { --len2; emit(VERT, 1); }
            else tv = VERT;
        }
        int segLen = 0;
        int tvOld = tv;
        if (len1 != 0 && len2 != 0) do {
            nextTraceValue = trace.at(len1 - 1, len2 - 1);
            if (tv == DIAG) tv = nextTraceValue & 3;
            else if (tv == HORIZ) tv = ((nextTraceValue >> 2) & 1) ? DIAG : HORIZ;
            else if (tv == VERT) tv = ((nextTraceValue >> 3) & 1) ? DIAG : VERT;
            if (tv == DIAG) {
                if (tv != tvOld) {
                    if (tvOld == VERT) --len2; else --len1;
                    ++segLen;
                    emit(tvOld, segLen);
                    tvOld = tv; segLen = 0;
                } else { ++segLen; --len1; --len2; }
            } else if (tv == HORIZ) {
                if (tv != tvOld) {
                    emit(tvOld, segLen);
                    if ((nextTraceValue >> 2) & 1) {
                        --len1; emit(HORIZ, 1);
                        tv = DIAG; segLen = 0;
                    } else { tvOld = tv; segLen = 1; --len1; }
                } else { ++segLen; --len1; }
            } else {  // VERT
                if (tv != tvOld) {
                    emit(tvOld, segLen);
                    if ((nextTraceValue >> 3) & 1) {
                        --len2; emit(VERT, 1);
                        tv = DIAG; segLen = 0;
                    } else { tvOld = tv; segLen = 1; --len2; }
                } else { ++segLen; --len2; }
            }
        } while (len1 != 0 && len2 != 0);
        if (segLen) emit(tvOld, segLen);
    }
    if (len1 != 0) emit(HORIZ, len1);
    else if (len2 != 0) emit(VERT, len2);

    int n = (int)rev.size();
    for (int i = 0; i < n; i++) ops[i] = rev[n - 1 - i];
    ops[n] = 0;
    *ops_len = n;
    return score;
}

}  // extern "C"
