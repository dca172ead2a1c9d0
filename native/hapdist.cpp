// Native block algebra for haplotype generation: the per-read hot path of
// HaplotypeDistribution (engine/hapgen.py, itself a behavioral port of
// /root/reference/HaplotypeDistribution.cpp:29-436 + HapBlock.cpp:20-57).
//
// Only the read-ingestion side lives here (insertRead / insertSeq /
// splitBlock / HapBlock substring-merge): ~50 block operations per read
// dominated the host profile as recursive Python.  Block selection,
// maxHap pruning and haplotype enumeration stay in Python (HDIterator),
// consuming a one-shot export of the final block structure.
//
// Exact-equivalence contract with the Python implementation (asserted in
// tests/test_hapgen_native.py): same block boundaries, same per-block
// haplotype sets keyed by sequence bytes, same counts/types/frequencies,
// same error strings at the same trigger points.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

using std::int32_t;
using std::int64_t;
using std::uint32_t;

// haplotype type bits (Haplotype.hpp:47-50)
constexpr int T_REF = 1;
constexpr int T_NORMAL = 2;
constexpr int T_IN = 4;
constexpr int T_DEL = 8;

constexpr int B_NORMAL = 0;
constexpr int B_INSERT = 1;

// error codes -> exact HapGenError message strings (python side maps back)
enum ErrCode {
  OK = 0,
  E_EMPTY_HAP = 1,          // "Empty haplotype!"
  E_OUTSIDE_BLOCK = 2,      // "seq outside of block boundaries"
  E_UPDATE_MISMATCH = 3,    // "updateBlock-seq mismatch."
  E_CANNOT_HANDLE = 4,      // "Cannot handle this case."
  E_MAG_NIET = 5,           // "Mag niet."
  E_SMOKE_CIGAR = 6,        // "I don't know how to smoke this CIGAR"
};

struct BlockHap {
  int type = T_NORMAL;
  int64_t count = 0;
  double freq = 0.0;
};

struct HapBlock {
  int64_t pos0, pos1;
  int type = B_NORMAL;
  std::map<std::string, BlockHap> haps;

  HapBlock(const std::string& seq, int typ, int64_t start, int64_t length)
      : pos0(start), pos1(start + length - 1) {
    insert_hap(seq, typ);
  }
  HapBlock(int64_t start, int64_t length) : pos0(start), pos1(start + length - 1) {}

  // HapBlock::insert (HapBlock.cpp:48-57)
  void insert_hap(const std::string& seq, int typ) {
    auto it = haps.find(seq);
    if (it == haps.end()) {
      BlockHap h;
      h.type = typ;
      h.count = 1;
      haps.emplace(seq, h);
    } else {
      if (typ & T_REF) it->second.type = T_REF;
      it->second.count += 1;
    }
  }

  // substring copy with count merging (HapBlock.cpp:20-46)
  static HapBlock sub_block(const HapBlock& hb, int64_t start, int64_t length) {
    HapBlock out(start, length);
    int64_t off = start - hb.pos0;
    for (const auto& kv : hb.haps) {
      // invariant: every seq in a normal block spans the block exactly
      std::string sub = kv.first.substr((size_t)off, (size_t)length);
      auto it = out.haps.find(sub);
      if (it == out.haps.end()) {
        BlockHap h;
        h.type = kv.second.type;
        h.count = kv.second.count;
        out.haps.emplace(std::move(sub), h);
      } else {
        if (kv.second.type & T_REF) it->second.type = T_REF;
        it->second.count += kv.second.count;
      }
    }
    return out;
  }

  int64_t length() const { return pos1 - pos0 + 1; }

  void set_frequencies() {
    int64_t s = 0;
    for (const auto& kv : haps) s += kv.second.count;
    for (auto& kv : haps) kv.second.freq = (double)kv.second.count / (double)s;
  }
};

struct HapDist {
  std::vector<HapBlock> blocks;   // position-sorted, non-overlapping
  std::vector<int64_t> starts;    // parallel pos0 list (bisect)
  std::map<int64_t, HapBlock> insertions;

  // --- block algebra (python _new_block/_first_overlapping/_split_block) ---

  void new_block(HapBlock&& hb) {
    // bisect_right: equal-start newcomer lands after the incumbent
    size_t i = std::upper_bound(starts.begin(), starts.end(), hb.pos0) -
               starts.begin();
    starts.insert(starts.begin() + i, hb.pos0);
    blocks.insert(blocks.begin() + i, std::move(hb));
  }

  void del_block(size_t idx) {
    blocks.erase(blocks.begin() + idx);
    starts.erase(starts.begin() + idx);
  }

  int64_t first_overlapping(int64_t seq_start, int64_t seq_end) const {
    int64_t i = (int64_t)(std::upper_bound(starts.begin(), starts.end(),
                                           seq_start) - starts.begin()) - 1;
    if (i >= 0 && blocks[(size_t)i].pos1 >= seq_start) return i;
    ++i;
    if (i < (int64_t)blocks.size() && blocks[(size_t)i].pos0 <= seq_end)
      return i;
    return -1;
  }

  // HaplotypeDistribution::splitBlock (HaplotypeDistribution.cpp:288-330)
  int split_block(size_t idx, const std::string& seq, int typ, int64_t seq_start) {
    if (seq.empty()) return E_EMPTY_HAP;
    int64_t seq_end = seq_start + (int64_t)seq.size() - 1;
    HapBlock block = std::move(blocks[idx]);  // copy-out before mutation
    if (seq_start < block.pos0 || seq_end > block.pos1) return E_OUTSIDE_BLOCK;
    int64_t len_a = seq_start - block.pos0;
    int64_t len_b = (int64_t)seq.size();
    int64_t len_c = (block.pos1 == seq_end) ? 0 : block.pos1 - seq_end;
    del_block(idx);
    HapBlock hb_b = HapBlock::sub_block(block, block.pos0 + len_a, len_b);
    if ((int64_t)seq.size() != hb_b.length() || seq_start != hb_b.pos0)
      return E_UPDATE_MISMATCH;
    hb_b.insert_hap(seq, typ);
    int64_t b_end = hb_b.pos1;
    new_block(std::move(hb_b));
    if (len_a) new_block(HapBlock::sub_block(block, block.pos0, len_a));
    if (len_c) new_block(HapBlock::sub_block(block, b_end + 1, len_c));
    return OK;
  }

  // HaplotypeDistribution::insertSeq (HaplotypeDistribution.cpp:343-436)
  int insert_seq(const std::string& seq, int typ, int64_t seq_start) {
    if (typ == T_NORMAL || typ == T_REF || typ == T_DEL) {
      int64_t seq_end = seq_start + (int64_t)seq.size() - 1;
      int64_t idx = first_overlapping(seq_start, seq_end);
      if (idx != -1) {
        HapBlock& block = blocks[(size_t)idx];
        if (block.pos0 < seq_start) {
          if (seq_end > block.pos1) {
            // block **********   seq        ********
            int64_t overlap = block.pos1 - seq_start + 1;
            int rc = split_block((size_t)idx, seq.substr(0, (size_t)overlap),
                                 typ, seq_start);
            if (rc) return rc;
            return insert_seq(seq.substr((size_t)overlap), typ,
                              seq_start + overlap);
          } else {
            // block *************  seq   *****
            return split_block((size_t)idx, seq, typ, seq_start);
          }
        } else {
          if (block.pos1 > seq_end) {
            // block    ***********  seq *******
            int64_t overlap = seq_end - block.pos0 + 1;
            int64_t b0 = block.pos0;
            int rc = split_block((size_t)idx,
                                 seq.substr(seq.size() - (size_t)overlap),
                                 typ, b0);
            if (rc) return rc;
            if (overlap < (int64_t)seq.size())
              new_block(HapBlock(seq.substr(0, seq.size() - (size_t)overlap),
                                 typ, seq_start,
                                 (int64_t)seq.size() - overlap));
            return OK;
          } else {
            // block    ***** ***   seq ******************
            int64_t len_a = block.pos0 - seq_start;
            int64_t len_b = block.pos1 - block.pos0 + 1;
            int64_t len_c = seq_end - block.pos1;
            if ((int64_t)seq.size() - len_a < len_b ||
                len_b != block.length())
              return E_UPDATE_MISMATCH;
            block.insert_hap(seq.substr((size_t)len_a, (size_t)len_b), typ);
            if (len_a)
              new_block(HapBlock(seq.substr(0, (size_t)len_a), typ,
                                 seq_start, len_a));
            if (len_c)
              return insert_seq(seq.substr((size_t)(len_a + len_b)), typ,
                                seq_start + len_a + len_b);
            return OK;
          }
        }
      } else {
        new_block(HapBlock(seq, typ, seq_start, (int64_t)seq.size()));
        return OK;
      }
    } else if (typ == T_IN) {
      auto it = insertions.find(seq_start);
      if (it == insertions.end()) {
        HapBlock hb(seq, T_IN, seq_start, (int64_t)seq.size());
        hb.type = B_INSERT;
        hb.insert_hap("", T_REF);  // no-insertion haplotype
        insertions.emplace(seq_start, std::move(hb));
      } else {
        it->second.insert_hap(seq, T_IN);
      }
      return OK;
    }
    return E_CANNOT_HANDLE;
  }

  // HaplotypeDistribution::insertRead (HaplotypeDistribution.cpp:74-164);
  // mirrors python insert_read statement-for-statement (incl. op order
  // of the insert / no-insertion-marker steps and the >30bp deletion
  // code clamp to chr(65))
  int insert_read(int64_t pos, const uint32_t* cig, int32_t ncig,
                  const char* rseq, int64_t rseq_len) {
    static const char OPS[] = "MIDNSHP=X";
    int64_t ref_pos = pos;
    int lastop = -1;  // -1 = none
    int64_t last_pos = ref_pos;
    int64_t l = 0;
    for (int32_t k = 0; k < ncig; ++k) {
      char op = OPS[cig[k] & 0xF];
      int64_t ln = cig[k] >> 4;
      std::string seq;
      int typ = T_NORMAL;
      // '='/'X' are M refinements (the reference binary errors on
      // them, GetCandidates.cpp:98); process with M semantics
      if (op == 'I' || op == 'M' || op == 'S' || op == '=' || op == 'X') {
        int64_t lo = l < rseq_len ? l : rseq_len;
        int64_t hi = l + ln < rseq_len ? l + ln : rseq_len;  // slice clamp
        seq.assign(rseq + lo, rseq + hi);
        l += ln;
      } else if (op == 'D') {
        seq.assign((size_t)ln, '#');
      }
      if (op == 'I') typ = T_IN;
      else if (op == 'D') typ = T_DEL;
      if (!seq.empty()) {
        if (seq[0] == '#') {
          if ((int64_t)seq.size() > 30) ln = 30;
          seq.assign(1, (char)(35 + ln));
        }
        int rc = insert_seq(seq, typ, ref_pos);
        if (rc) return rc;
      }
      if (lastop != -1 && lastop != 'I') {
        if (last_pos == ref_pos && lastop != 'S' && lastop != 'H')
          return E_MAG_NIET;
        for (auto it = insertions.lower_bound(last_pos);
             it != insertions.end() && it->first < ref_pos; ++it)
          it->second.insert_hap("", T_IN);
      }
      last_pos = ref_pos;
      if (op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X')
        ref_pos += ln;
      else if (op != 'I' && op != 'S' && op != 'H') return E_SMOKE_CIGAR;
      lastop = op;
    }
    return OK;
  }
};

}  // namespace

extern "C" {

void* hapdist_new(const char* ref_seq, int64_t ref_len, int64_t ref_start) {
  HapDist* hd = new HapDist();
  const int64_t bs = 4;  // 4bp Ref chunks (HaplotypeDistribution.cpp:49)
  int64_t nchunks = ref_len / bs + (ref_len % bs == 0 ? 0 : 1);
  for (int64_t x = 0; x < nchunks; ++x) {
    int64_t lo = x * bs;
    int64_t hi = lo + bs < ref_len ? lo + bs : ref_len;
    int rc = hd->insert_seq(std::string(ref_seq + lo, ref_seq + hi), T_REF,
                            ref_start + lo);
    if (rc) { delete hd; return nullptr; }
  }
  return hd;
}

void hapdist_free(void* h) { delete (HapDist*)h; }

int32_t hapdist_insert_read(void* h, int64_t pos, const uint32_t* cig,
                            int32_t ncig, const char* seq, int64_t seq_len) {
  return ((HapDist*)h)->insert_read(pos, cig, ncig, seq, seq_len);
}

// Batched ingestion: one call per window instead of one ctypes round
// trip per read.  Sequential with first-error abort — identical
// semantics to the per-read loop (the engine discards the whole
// distribution on error anyway).
int32_t hapdist_insert_reads(void* h, int64_t n, const int64_t* pos,
                             const uint32_t* cig, const int64_t* cig_off,
                             const char* seqs, const int64_t* seq_off) {
  HapDist* hd = (HapDist*)h;
  for (int64_t i = 0; i < n; ++i) {
    int32_t rc = hd->insert_read(
        pos[i], cig + cig_off[i], (int32_t)(cig_off[i + 1] - cig_off[i]),
        seqs + seq_off[i], seq_off[i + 1] - seq_off[i]);
    if (rc) return rc;
  }
  return 0;
}

void hapdist_set_freqs(void* h) {
  HapDist* hd = (HapDist*)h;
  for (auto& b : hd->blocks) b.set_frequencies();
  for (auto& kv : hd->insertions) kv.second.set_frequencies();
}

void hapdist_counts(void* h, int64_t* n_norm, int64_t* n_ins,
                    int64_t* n_haps, int64_t* seq_bytes) {
  HapDist* hd = (HapDist*)h;
  *n_norm = (int64_t)hd->blocks.size();
  *n_ins = (int64_t)hd->insertions.size();
  int64_t nh = 0, sb = 0;
  for (const auto& b : hd->blocks) {
    nh += (int64_t)b.haps.size();
    for (const auto& kv : b.haps) sb += (int64_t)kv.first.size();
  }
  for (const auto& ib : hd->insertions) {
    nh += (int64_t)ib.second.haps.size();
    for (const auto& kv : ib.second.haps) sb += (int64_t)kv.first.size();
  }
  *n_haps = nh;
  *seq_bytes = sb;
}

// Blocks exported normal-first (position order), then insertion blocks
// (key order); per block haps in sorted-by-seq order (std::map), which is
// the order python's sorted_haps() produces.
void hapdist_export(void* h, int64_t* pos0, int64_t* pos1, int32_t* btype,
                    int64_t* hap_off, int32_t* htype, int64_t* hcount,
                    double* hfreq, int64_t* seq_off, char* arena) {
  HapDist* hd = (HapDist*)h;
  int64_t bi = 0, hi = 0, so = 0;
  hap_off[0] = 0;
  seq_off[0] = 0;
  auto emit = [&](const HapBlock& b, int type, int64_t p0, int64_t p1) {
    pos0[bi] = p0;
    pos1[bi] = p1;
    btype[bi] = type;
    for (const auto& kv : b.haps) {
      htype[hi] = kv.second.type;
      hcount[hi] = kv.second.count;
      hfreq[hi] = kv.second.freq;
      std::memcpy(arena + so, kv.first.data(), kv.first.size());
      so += (int64_t)kv.first.size();
      seq_off[hi + 1] = so;
      ++hi;
    }
    hap_off[bi + 1] = hi;
    ++bi;
  };
  for (const auto& b : hd->blocks) emit(b, B_NORMAL, b.pos0, b.pos1);
  for (const auto& kv : hd->insertions)
    emit(kv.second, B_INSERT, kv.second.pos0, kv.second.pos1);
}

}  // extern "C"
