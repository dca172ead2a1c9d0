// Native MAP-state decode statistics: single cache-friendly pass over the
// fetched (B, L_pad) map_state matrix producing every per-pair scalar the
// callers consume (hmm/batch.py LiksView.__init__'s ~20 numpy passes).
//
// Exact-equivalence contract with the numpy implementation (asserted in
// tests/test_liks_view.py): identical xs / hpos codes, counts, fb/lb,
// flags — and bit-identical m_log_bq: log10 values are computed on the
// host with numpy (f64) and only accumulated here, strictly
// left-to-right per pair, the same order as the column loop (x + 0.0 in
// the masked numpy version is an exact no-op, so skipping masked columns
// is bit-equivalent).

#include <cstdint>

extern "C" {

void ddec_stats(int64_t B, int64_t L_pad, int64_t H_pad, int64_t nr,
                const int16_t* ms, const int32_t* read_len,
                const int32_t* hap_len, const uint8_t* read_codes,
                const uint8_t* hap_codes, const double* qual,
                const double* log10q, double bq_thr,
                int32_t* xs_out, int32_t* hpos_out, uint8_t* del_out,
                int64_t* n_bqt, int64_t* n_mm_bqt, int64_t* n_mm_left,
                int64_t* n_mm_right, int64_t* num_mm, double* m_log_bq,
                int64_t* fb, int64_t* lb, uint8_t* has_event,
                uint8_t* any_mism) {
  const int64_t S_half = H_pad + 2;
  const int32_t HPOS_LO = -3, HPOS_RO = -4;
  for (int64_t i = 0; i < B; ++i) {
    const int16_t* ms_row = ms + i * L_pad;
    const uint8_t* rc_row = read_codes + i * L_pad;
    const uint8_t* hc_row = hap_codes + i * H_pad;
    const double* q_row = qual + (i % nr) * L_pad;
    const double* lq_row = log10q + (i % nr) * L_pad;
    int32_t* xs_row = xs_out + i * L_pad;
    int32_t* hp_row = hpos_out + i * L_pad;
    uint8_t* del_row = del_out + i * (L_pad - 1);
    const int64_t rl = read_len[i];
    const int64_t hl = hap_len[i];
    int64_t nbqt = 0, nmmbqt = 0, nmml = 0, nmmr = 0, nmm = 0;
    int64_t fb_i = INT64_MAX, lb_i = -1;
    double mlbq = 0.0;
    uint8_t hev = 0, amm = 0;
    bool prev_noins_on = false;
    int32_t prev_xs = 0;
    for (int64_t b = 0; b < L_pad; ++b) {
      const int32_t m = ms_row[b];
      const bool ins = m >= S_half;
      const int32_t x = (int32_t)(m % S_half);
      const int32_t xs = (x == (int32_t)(H_pad + 1)) ? (int32_t)(hl + 1) : x;
      const bool valid = b < rl;
      const bool on = xs >= 1 && xs <= (int32_t)hl && valid;
      const bool noins_on = on && !ins;
      xs_row[b] = xs;
      hp_row[b] = noins_on ? xs - 1 : (xs == 0 ? HPOS_LO : HPOS_RO);
      if (noins_on) {
        const int64_t v = xs - 1;
        if (v < fb_i) fb_i = v;
        if (v > lb_i) lb_i = v;
        const double q = q_row[b];
        const bool bqt = q > bq_thr;
        if (bqt) {
          ++nbqt;
          mlbq += lq_row[b];
        }
        int32_t ci = xs - 1;
        if (ci < 0) ci = 0;
        if (ci > (int32_t)(H_pad - 1)) ci = (int32_t)(H_pad - 1);
        if (rc_row[b] != hc_row[ci]) {
          amm = 1;
          if (bqt) ++nmmbqt;
          if (b < 6) ++nmml;
          if (b > rl - 6) ++nmmr;
          if (q > 0.95) ++nmm;
        }
      }
      if (ins && on) hev = 1;
      // del event between b-1 and b: noins_on[b-1] & !ins[b] & b < rl
      // & xs[b] - xs[b-1] > 1
      if (b > 0) {
        const bool dl =
            prev_noins_on && !ins && valid && xs - prev_xs > 1;
        del_row[b - 1] = dl;
        if (dl) hev = 1;
      }
      prev_noins_on = noins_on;
      prev_xs = xs;
    }
    n_bqt[i] = nbqt;
    n_mm_bqt[i] = nmmbqt;
    n_mm_left[i] = nmml;
    n_mm_right[i] = nmmr;
    num_mm[i] = nmm;
    m_log_bq[i] = mlbq;
    fb[i] = fb_i == INT64_MAX ? -1 : fb_i;
    lb[i] = lb_i;
    has_event[i] = hev;
    any_mism[i] = amm;
  }
}

}  // extern "C"
