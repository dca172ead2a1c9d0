// C++ BGZF/BAM decoder — the native host data plane.
//
// The reference links samtools-0.1.19 libbam (Makefile:8,11) for BAM
// decoding; this is our from-the-spec equivalent (SAM/BAM spec sections
// 4.1-4.2, 5.2-5.3; no samtools code).  It exists because BAM decode is
// the host-side bottleneck at pod scale (SURVEY.md §7 "Hard parts"): the
// pure-Python reader in dindel_tpu/io/bam.py decodes ~10-50k records/s,
// this does millions/s.  Exposed via ctypes (dindel_tpu/io/bam_native.py)
// with a batch-arena interface: fixed-width fields land in int32 arrays,
// variable-length payloads (qname / cigar / seq / qual / aux) in
// contiguous arenas with prefix-offset tables, so Python materializes
// records with O(1) slicing instead of per-byte loops.
//
// Semantics mirror dindel_tpu/io/bam.py exactly (differential-tested in
// tests/test_io_native.py): same .bai bin/linear-index chunk walk, same
// early-return rule on (tid, pos >= end), same end_pos (bam_calend)
// overlap test.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <map>
#include <algorithm>
#include <zlib.h>

namespace {

static const char SEQ_NT16[17] = "=ACMGRSVTWYHKDBN";
static const char CIGAR_OPS[10] = "MIDNSHP=X";

struct BgzfReader {
    FILE* f = nullptr;
    int64_t block_coffset = -1;   // compressed offset of loaded block
    int64_t next_coffset = 0;     // compressed offset of the next block
    size_t upos = 0;
    bool eof = false;

    // Inflated-block LRU cache.  The engine's sliding getReads fetch
    // walks the SAME BGZF blocks ~(fetch span / window stride) times:
    // each incremental fetch's .bai chunk walk starts at the enclosing
    // 16kb linear-index entry, so adjacent windows re-read largely the
    // same blocks.  Caching the inflate output (the dominant cost, ~0.3
    // ms per 64KB block) turns those re-reads into pointer swaps.
    struct Block { std::vector<uint8_t> data; int64_t next_co = 0;
                   uint64_t stamp = 0; };
    std::map<int64_t, Block> cache;   // keyed by compressed offset
    uint64_t stamp_counter = 0;
    static const size_t CACHE_MAX = 64;   // x <=64KB inflated = <=4MB
    const std::vector<uint8_t>* ub = nullptr;  // current block payload

    size_t usize() const { return ub ? ub->size() : 0; }

    bool open(const char* path) {
        f = fopen(path, "rb");
        return f != nullptr;
    }
    void close() {
        if (f) fclose(f);
        f = nullptr;
    }

    // Load (from cache, else read + inflate) the BGZF block at
    // compressed offset `co`.
    bool load_block_at(int64_t co) {
        if (co == block_coffset) return true;
        auto it = cache.find(co);
        if (it == cache.end()) {
            if (fseeko(f, co, SEEK_SET) != 0) return false;
            uint8_t hdr[12];
            if (fread(hdr, 1, 12, f) != 12) { eof = true; return false; }
            if (!(hdr[0] == 31 && hdr[1] == 139 && hdr[2] == 8 &&
                  hdr[3] == 4))
                return false;
            uint16_t xlen = hdr[10] | (hdr[11] << 8);
            std::vector<uint8_t> extra(xlen);
            if (fread(extra.data(), 1, xlen, f) != xlen) return false;
            int32_t bsize = -1;
            for (size_t i = 0; i + 4 <= extra.size();) {
                uint8_t si1 = extra[i], si2 = extra[i + 1];
                uint16_t slen = extra[i + 2] | (extra[i + 3] << 8);
                if (si1 == 'B' && si2 == 'C' && slen == 2)
                    bsize = (extra[i + 4] | (extra[i + 5] << 8)) + 1;
                i += 4 + slen;
            }
            if (bsize < 0) return false;
            int64_t cdata_len = (int64_t)bsize - 12 - xlen - 8;
            if (cdata_len < 0) return false;
            std::vector<uint8_t> cdata(cdata_len);
            if (fread(cdata.data(), 1, cdata_len, f) != (size_t)cdata_len)
                return false;
            uint8_t tail[8];
            if (fread(tail, 1, 8, f) != 8) return false;
            uint32_t isize = tail[4] | (tail[5] << 8) | (tail[6] << 16) |
                             ((uint32_t)tail[7] << 24);
            Block b;
            b.data.resize(isize);
            if (isize > 0) {
                z_stream zs;
                memset(&zs, 0, sizeof(zs));
                if (inflateInit2(&zs, -15) != Z_OK) return false;
                zs.next_in = cdata.data();
                zs.avail_in = (uInt)cdata_len;
                zs.next_out = b.data.data();
                zs.avail_out = isize;
                int rc = inflate(&zs, Z_FINISH);
                inflateEnd(&zs);
                if (rc != Z_STREAM_END) return false;
            }
            b.next_co = co + bsize;
            if (cache.size() >= CACHE_MAX) {
                // evict the least-recently-used entry; never the block
                // `ub` currently points into (its map node must stay)
                auto victim = cache.end();
                for (auto c = cache.begin(); c != cache.end(); ++c) {
                    if (c->first == block_coffset) continue;
                    if (victim == cache.end() ||
                        c->second.stamp < victim->second.stamp)
                        victim = c;
                }
                if (victim != cache.end()) cache.erase(victim);
            }
            it = cache.emplace(co, std::move(b)).first;
        }
        it->second.stamp = ++stamp_counter;
        ub = &it->second.data;
        block_coffset = co;
        next_coffset = it->second.next_co;
        upos = 0;
        return true;
    }

    bool next_block() {
        if (block_coffset < 0) return load_block_at(next_coffset);
        int64_t co = next_coffset;
        while (true) {
            if (!load_block_at(co)) { eof = true; return false; }
            if (usize() != 0) return true;  // skip empty (EOF-marker) blocks
            co = next_coffset;
        }
    }

    // Read exactly n bytes (crossing blocks); returns bytes read.
    size_t read(uint8_t* out, size_t n) {
        size_t got = 0;
        while (got < n) {
            if (block_coffset < 0 || upos >= usize()) {
                if (!next_block()) break;
            }
            size_t take = std::min(n - got, usize() - upos);
            memcpy(out + got, ub->data() + upos, take);
            upos += take;
            got += take;
        }
        return got;
    }

    int64_t tell_virtual() {
        if (block_coffset < 0) return next_coffset << 16;
        if (upos >= usize()) return next_coffset << 16;
        return (block_coffset << 16) | (int64_t)upos;
    }

    bool seek_virtual(int64_t vo) {
        int64_t co = vo >> 16;
        size_t uo = (size_t)(vo & 0xFFFF);
        if (!load_block_at(co)) return false;
        if (uo > usize()) return false;
        upos = uo;
        eof = false;
        return true;
    }
};

struct BaiIndex {
    // per ref: bin -> chunks, plus linear index
    std::vector<std::map<uint32_t, std::vector<std::pair<uint64_t, uint64_t>>>> bins;
    std::vector<std::vector<uint64_t>> linear;
    bool loaded = false;

    bool load(const std::string& path) {
        FILE* f = fopen(path.c_str(), "rb");
        if (!f) return false;
        fseeko(f, 0, SEEK_END);
        int64_t sz = ftello(f);
        fseeko(f, 0, SEEK_SET);
        std::vector<uint8_t> d(sz);
        if (fread(d.data(), 1, sz, f) != (size_t)sz) { fclose(f); return false; }
        fclose(f);
        if (sz < 8 || memcmp(d.data(), "BAI\x01", 4) != 0) return false;
        size_t off = 4;
        auto rd_i32 = [&](int32_t* v) {
            memcpy(v, d.data() + off, 4); off += 4; };
        auto rd_u64 = [&](uint64_t* v) {
            memcpy(v, d.data() + off, 8); off += 8; };
        int32_t n_ref; rd_i32(&n_ref);
        bins.resize(n_ref);
        linear.resize(n_ref);
        for (int r = 0; r < n_ref; r++) {
            int32_t n_bin; rd_i32(&n_bin);
            for (int b = 0; b < n_bin; b++) {
                int32_t bin_id, n_chunk;
                rd_i32(&bin_id); rd_i32(&n_chunk);
                auto& v = bins[r][(uint32_t)bin_id];
                for (int c = 0; c < n_chunk; c++) {
                    uint64_t cb, ce; rd_u64(&cb); rd_u64(&ce);
                    v.emplace_back(cb, ce);
                }
            }
            int32_t n_intv; rd_i32(&n_intv);
            linear[r].resize(n_intv);
            for (int w = 0; w < n_intv; w++) rd_u64(&linear[r][w]);
        }
        loaded = true;
        return true;
    }
};

static void reg2bins(int64_t beg, int64_t end, std::vector<uint32_t>* out) {
    out->clear();
    out->push_back(0);
    end -= 1;
    static const int shifts[5] = {26, 23, 20, 17, 14};
    static const uint32_t bases[5] = {1, 9, 73, 585, 4681};
    for (int k = 0; k < 5; k++)
        for (int64_t b = bases[k] + (beg >> shifts[k]);
             b <= (int64_t)bases[k] + (end >> shifts[k]); b++)
            out->push_back((uint32_t)b);
}

struct Handle {
    BgzfReader bg;
    std::string path;
    std::string header_text;
    std::vector<std::string> ref_names;
    std::vector<int32_t> ref_lens;
    int64_t data_voffset = 0;
    BaiIndex bai;
    bool bai_tried = false;

    // batch arenas (current batch only)
    std::vector<int32_t> fixed;        // n x 8
    std::vector<int64_t> qname_off, cigar_off, seq_off, aux_off;
    std::vector<char> qname_arena;
    std::vector<uint32_t> cigar_arena;
    std::vector<char> seq_arena, qual_arena;
    std::vector<char> aux_arena;
    std::vector<uint8_t> recbuf;

    void clear_batch() {
        fixed.clear();
        qname_off.assign(1, 0);
        cigar_off.assign(1, 0);
        seq_off.assign(1, 0);
        aux_off.assign(1, 0);
        qname_arena.clear();
        cigar_arena.clear();
        seq_arena.clear();
        qual_arena.clear();
        aux_arena.clear();
    }

    // Read one raw record into recbuf; false at EOF.  Sets *rec_len.
    bool read_raw(int64_t* rec_len) {
        uint8_t lenb[4];
        if (bg.read(lenb, 4) != 4) return false;
        int32_t block_size;
        memcpy(&block_size, lenb, 4);
        if (block_size <= 0) return false;
        recbuf.resize(block_size);
        if (bg.read(recbuf.data(), block_size) != (size_t)block_size)
            return false;
        *rec_len = block_size;
        return true;
    }

    // Parse recbuf[0:len] and append to arenas.  Returns (tid, pos,
    // end_pos) via out params for fetch filtering.
    void append_record(int64_t len, int32_t* tid, int32_t* pos,
                       int64_t* endpos) {
        const uint8_t* d = recbuf.data();
        int32_t t, p, mtid, mpos, isize, l_seq;
        memcpy(&t, d + 0, 4);
        memcpy(&p, d + 4, 4);
        uint8_t l_qname = d[8];
        uint8_t mapq = d[9];
        uint16_t n_cigar, flag;
        memcpy(&n_cigar, d + 12, 2);
        memcpy(&flag, d + 14, 2);
        memcpy(&l_seq, d + 16, 4);
        memcpy(&mtid, d + 20, 4);
        memcpy(&mpos, d + 24, 4);
        memcpy(&isize, d + 28, 4);
        size_t off = 32;
        // qname (drop trailing NUL)
        qname_arena.insert(qname_arena.end(), (const char*)d + off,
                           (const char*)d + off + l_qname - 1);
        qname_off.push_back((int64_t)qname_arena.size());
        off += l_qname;
        // cigar + end_pos (bam_calend: pos + ref-consuming ops; pos+1 when
        // there is no cigar — matches BamRecord.end_pos)
        int64_t ep = p;
        for (int c = 0; c < n_cigar; c++) {
            uint32_t v;
            memcpy(&v, d + off, 4);
            off += 4;
            cigar_arena.push_back(v);
            uint32_t op = v & 0xF;
            // M=0 D=2 N=3 '='=7 X=8 consume reference
            if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
                ep += (int64_t)(v >> 4);
        }
        if (n_cigar == 0) ep = (int64_t)p + 1;
        cigar_off.push_back((int64_t)cigar_arena.size());
        // seq nibbles -> ASCII
        size_t nseq_bytes = ((size_t)l_seq + 1) / 2;
        size_t sbase = seq_arena.size();
        seq_arena.resize(sbase + l_seq);
        for (int32_t i = 0; i < l_seq; i++) {
            uint8_t b = d[off + (i >> 1)];
            uint8_t code = ((i & 1) == 0) ? (b >> 4) : (b & 0xF);
            seq_arena[sbase + i] = SEQ_NT16[code];
        }
        off += nseq_bytes;
        // qual (raw phred)
        qual_arena.insert(qual_arena.end(), (const char*)d + off,
                          (const char*)d + off + l_seq);
        seq_off.push_back((int64_t)seq_arena.size());
        off += l_seq;
        // aux: raw blob (Python parses lazily)
        aux_arena.insert(aux_arena.end(), (const char*)d + off,
                         (const char*)d + len);
        aux_off.push_back((int64_t)aux_arena.size());
        // fixed
        fixed.push_back(t);
        fixed.push_back(p);
        fixed.push_back(mapq);
        fixed.push_back(flag);
        fixed.push_back(mtid);
        fixed.push_back(mpos);
        fixed.push_back(isize);
        fixed.push_back(l_seq);
        *tid = t;
        *pos = p;
        *endpos = ep;
    }
};

}  // namespace

extern "C" {

void* dbam_open(const char* path) {
    Handle* h = new Handle();
    h->path = path;
    if (!h->bg.open(path)) { delete h; return nullptr; }
    uint8_t magic[4];
    if (h->bg.read(magic, 4) != 4 || memcmp(magic, "BAM\x01", 4) != 0) {
        h->bg.close(); delete h; return nullptr;
    }
    int32_t l_text;
    if (h->bg.read((uint8_t*)&l_text, 4) != 4) { h->bg.close(); delete h; return nullptr; }
    h->header_text.resize(l_text);
    h->bg.read((uint8_t*)h->header_text.data(), l_text);
    int32_t n_ref;
    h->bg.read((uint8_t*)&n_ref, 4);
    for (int r = 0; r < n_ref; r++) {
        int32_t l_name;
        h->bg.read((uint8_t*)&l_name, 4);
        std::string nm(l_name, '\0');
        h->bg.read((uint8_t*)nm.data(), l_name);
        nm.resize(l_name - 1);  // drop NUL
        int32_t l_ref;
        h->bg.read((uint8_t*)&l_ref, 4);
        h->ref_names.push_back(nm);
        h->ref_lens.push_back(l_ref);
    }
    h->data_voffset = h->bg.tell_virtual();
    h->clear_batch();
    return h;
}

void dbam_close(void* hp) {
    Handle* h = (Handle*)hp;
    h->bg.close();
    delete h;
}

int64_t dbam_header_text_len(void* hp) {
    return (int64_t)((Handle*)hp)->header_text.size();
}
void dbam_header_text(void* hp, char* out) {
    Handle* h = (Handle*)hp;
    memcpy(out, h->header_text.data(), h->header_text.size());
}
int32_t dbam_n_ref(void* hp) {
    return (int32_t)((Handle*)hp)->ref_names.size();
}
int32_t dbam_ref_name_len(void* hp, int32_t tid) {
    return (int32_t)((Handle*)hp)->ref_names[tid].size();
}
void dbam_ref_name(void* hp, int32_t tid, char* out) {
    Handle* h = (Handle*)hp;
    memcpy(out, h->ref_names[tid].data(), h->ref_names[tid].size());
}
int32_t dbam_ref_len(void* hp, int32_t tid) {
    return ((Handle*)hp)->ref_lens[tid];
}

void dbam_rewind(void* hp) {
    Handle* h = (Handle*)hp;
    h->bg.seek_virtual(h->data_voffset);
}

// Sequential batch read from the current position.
int64_t dbam_read_batch(void* hp, int64_t max_records) {
    Handle* h = (Handle*)hp;
    h->clear_batch();
    int64_t n = 0;
    int64_t len;
    int32_t tid, pos;
    int64_t ep;
    while (n < max_records && h->read_raw(&len)) {
        h->append_record(len, &tid, &pos, &ep);
        n++;
    }
    return n;
}

// Region fetch via .bai: loads ALL overlapping records into the arena.
// Mirrors dindel_tpu/io/bam.py BamReader.fetch chunk walk exactly.
// Returns record count, or -1 if no usable index.
int64_t dbam_fetch(void* hp, int32_t tid, int64_t beg, int64_t end) {
    Handle* h = (Handle*)hp;
    if (!h->bai_tried) {
        h->bai_tried = true;
        h->bai.load(h->path + ".bai");
    }
    if (!h->bai.loaded || tid < 0 || tid >= (int32_t)h->bai.bins.size())
        return -1;
    h->clear_batch();
    uint64_t min_off = 0;
    const auto& lin = h->bai.linear[tid];
    int64_t lin_i = beg >> 14;
    if (lin_i >= 0 && lin_i < (int64_t)lin.size()) min_off = lin[lin_i];
    std::vector<uint32_t> cand;
    reg2bins(beg, end, &cand);
    std::vector<std::pair<uint64_t, uint64_t>> chunks;
    const auto& bm = h->bai.bins[tid];
    for (uint32_t b : cand) {
        auto it = bm.find(b);
        if (it == bm.end()) continue;
        for (const auto& c : it->second)
            if (c.second > min_off)
                chunks.emplace_back(std::max(c.first, min_off), c.second);
    }
    std::sort(chunks.begin(), chunks.end());
    std::vector<std::pair<uint64_t, uint64_t>> merged;
    for (const auto& c : chunks) {
        if (!merged.empty() && c.first <= merged.back().second)
            merged.back().second = std::max(merged.back().second, c.second);
        else
            merged.push_back(c);
    }
    int64_t n = 0;
    for (const auto& c : merged) {
        if (!h->bg.seek_virtual((int64_t)c.first)) continue;
        while ((uint64_t)h->bg.tell_virtual() < c.second) {
            int64_t len;
            if (!h->read_raw(&len)) break;
            int32_t rtid, rpos;
            int64_t ep;
            size_t nfix = h->fixed.size();
            size_t nq = h->qname_arena.size(), nc = h->cigar_arena.size();
            size_t ns = h->seq_arena.size(), nu = h->qual_arena.size();
            size_t na = h->aux_arena.size();
            h->append_record(len, &rtid, &rpos, &ep);
            if (rtid != tid || rpos >= end) {
                // roll back the just-appended record and stop entirely
                // (mirrors the Python early-return)
                h->fixed.resize(nfix);
                h->qname_arena.resize(nq);
                h->cigar_arena.resize(nc);
                h->seq_arena.resize(ns);
                h->qual_arena.resize(nu);
                h->aux_arena.resize(na);
                h->qname_off.pop_back();
                h->cigar_off.pop_back();
                h->seq_off.pop_back();
                h->aux_off.pop_back();
                return n;
            }
            if (ep > beg) {
                n++;
            } else {
                h->fixed.resize(nfix);
                h->qname_arena.resize(nq);
                h->cigar_arena.resize(nc);
                h->seq_arena.resize(ns);
                h->qual_arena.resize(nu);
                h->aux_arena.resize(na);
                h->qname_off.pop_back();
                h->cigar_off.pop_back();
                h->seq_off.pop_back();
                h->aux_off.pop_back();
            }
        }
    }
    return n;
}

// Arena sizes for the current batch (so Python can allocate).
void dbam_arena_sizes(void* hp, int64_t* n_records, int64_t* qname_bytes,
                      int64_t* cigar_u32, int64_t* seq_bytes,
                      int64_t* aux_bytes) {
    Handle* h = (Handle*)hp;
    *n_records = (int64_t)(h->fixed.size() / 8);
    *qname_bytes = (int64_t)h->qname_arena.size();
    *cigar_u32 = (int64_t)h->cigar_arena.size();
    *seq_bytes = (int64_t)h->seq_arena.size();
    *aux_bytes = (int64_t)h->aux_arena.size();
}

// Copy out the batch.  fixed: n x 8 int32 (tid,pos,mapq,flag,mtid,mpos,
// isize,l_seq); offsets are n+1 prefix arrays.
void dbam_batch(void* hp, int32_t* fixed,
                char* qname, int64_t* qname_off,
                uint32_t* cigar, int64_t* cigar_off,
                char* seq, char* qual, int64_t* seq_off,
                char* aux, int64_t* aux_off) {
    Handle* h = (Handle*)hp;
    size_t n = h->fixed.size() / 8;
    memcpy(fixed, h->fixed.data(), h->fixed.size() * 4);
    memcpy(qname, h->qname_arena.data(), h->qname_arena.size());
    memcpy(qname_off, h->qname_off.data(), (n + 1) * 8);
    memcpy(cigar, h->cigar_arena.data(), h->cigar_arena.size() * 4);
    memcpy(cigar_off, h->cigar_off.data(), (n + 1) * 8);
    memcpy(seq, h->seq_arena.data(), h->seq_arena.size());
    memcpy(qual, h->qual_arena.data(), h->qual_arena.size());
    memcpy(seq_off, h->seq_off.data(), (n + 1) * 8);
    memcpy(aux, h->aux_arena.data(), h->aux_arena.size());
    memcpy(aux_off, h->aux_off.data(), (n + 1) * 8);
}

}  // extern "C"
