// streampress codec — native data-plane component of rcppml_tpu.
//
// Implements the SparsePress v2 chunked sparse format (format spec:
// reference inst/include/streampress/format/header_v2.hpp:1-90, codec
// behavior per streampress/codec/{rans,varint}.hpp and
// sparsepress_v2.hpp encode/decode sections).  Independent implementation:
// flat C-ABI functions over std::vector buffers, exposed to Python via
// ctypes (rcppml_tpu/io/spz.py).
//
// Build: g++ -O3 -march=native -shared -fPIC streampress.cpp -o libstreampress.so

#include <algorithm>
#include <array>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <stdexcept>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// varint (LEB128)
// ---------------------------------------------------------------------------

inline void varint_put(uint64_t v, std::vector<uint8_t>& out) {
    do {
        uint8_t b = v & 0x7F;
        v >>= 7;
        if (v) b |= 0x80;
        out.push_back(b);
    } while (v);
}

[[noreturn]] inline void corrupt(const char* what) {
    throw std::runtime_error(std::string("corrupt spz: ") + what);
}

// every byte read is validated against an explicit end pointer — file
// contents are untrusted (round-1 advisor finding; the reference validates
// section sizes the same way, sparsepress_v2.hpp:913)
inline void need(const uint8_t* p, const uint8_t* end, uint64_t nbytes,
                 const char* what) {
    if (p > end || static_cast<uint64_t>(end - p) < nbytes) corrupt(what);
}

inline uint64_t varint_get(const uint8_t*& p, const uint8_t* end) {
    uint64_t v = 0;
    int shift = 0;
    for (;;) {
        if (p >= end) corrupt("truncated varint");
        uint8_t b = *p++;
        if (shift < 64)
            v |= static_cast<uint64_t>(b & 0x7F) << shift;
        if (!(b & 0x80)) break;
        shift += 7;
        if (shift > 63) corrupt("varint too long");
    }
    return v;
}

inline uint32_t get_u32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

inline uint32_t get_u32_checked(const uint8_t*& p, const uint8_t* end) {
    need(p, end, 4, "truncated u32");
    uint32_t v = get_u32(p);
    p += 4;
    return v;
}

inline void put_u32(uint32_t v, std::vector<uint8_t>& out) {
    out.push_back(v & 0xFF);
    out.push_back((v >> 8) & 0xFF);
    out.push_back((v >> 16) & 0xFF);
    out.push_back((v >> 24) & 0xFF);
}

// ---------------------------------------------------------------------------
// rANS, byte-renormalized, PROB_BITS = 14 (format-compatible)
// ---------------------------------------------------------------------------

constexpr int kProbBits = 14;
constexpr uint32_t kProbScale = 1u << kProbBits;
constexpr uint32_t kRansL = 1u << 23;

struct Table {
    uint32_t n = 0;
    std::vector<uint16_t> freq;
    std::vector<uint16_t> cum;
    std::vector<uint16_t> lookup;   // cum slot -> symbol

    void finish() {
        // untrusted 16-bit freqs: their running sum must stay within the
        // kProbScale-entry lookup or the fill below writes out of bounds
        uint64_t total = 0;
        for (uint32_t i = 0; i < n; ++i) total += freq[i];
        if (total > kProbScale) corrupt("rANS table frequencies exceed scale");
        cum.assign(n, 0);
        uint16_t c = 0;
        for (uint32_t i = 0; i < n; ++i) {
            cum[i] = c;
            c = static_cast<uint16_t>(c + freq[i]);
        }
        lookup.assign(kProbScale, 0);
        for (uint32_t s = 0; s < n; ++s)
            for (uint32_t k = 0; k < freq[s]; ++k)
                lookup[cum[s] + k] = static_cast<uint16_t>(s);
    }

    // Normalize raw counts so they sum exactly to kProbScale with every
    // present symbol >= 1.
    void build(const std::vector<uint64_t>& counts) {
        n = static_cast<uint32_t>(counts.size());
        freq.assign(n, 0);
        uint64_t total = 0;
        uint32_t nz = 0;
        for (auto c : counts) { total += c; if (c) ++nz; }
        if (!total) { finish(); return; }
        uint64_t assigned = 0;
        uint32_t budget = kProbScale - nz;
        for (uint32_t i = 0; i < n; ++i) {
            if (!counts[i]) continue;
            double frac = static_cast<double>(counts[i]) / static_cast<double>(total);
            uint32_t f = 1 + static_cast<uint32_t>(frac * budget);
            freq[i] = static_cast<uint16_t>(f);
            assigned += f;
        }
        int64_t diff = static_cast<int64_t>(assigned) - kProbScale;
        // walk repeatedly, trimming the largest / topping the smallest
        while (diff != 0) {
            if (diff > 0) {
                uint32_t best = 0; uint16_t fmax = 0;
                for (uint32_t i = 0; i < n; ++i)
                    if (freq[i] > fmax) { fmax = freq[i]; best = i; }
                if (fmax <= 1) break;
                --freq[best]; --diff;
            } else {
                uint32_t best = 0; uint16_t fmin = 0xFFFF;
                for (uint32_t i = 0; i < n; ++i)
                    if (freq[i] && freq[i] < fmin) { fmin = freq[i]; best = i; }
                ++freq[best]; ++diff;
            }
        }
        finish();
    }

    std::vector<uint8_t> serialize() const {
        std::vector<uint8_t> out;
        out.push_back(n & 0xFF);
        out.push_back((n >> 8) & 0xFF);
        for (uint32_t i = 0; i < n; ++i) {
            out.push_back(freq[i] & 0xFF);
            out.push_back((freq[i] >> 8) & 0xFF);
        }
        return out;
    }

    static Table deserialize(const uint8_t*& p, const uint8_t* end) {
        Table t;
        need(p, end, 2, "truncated rANS table");
        t.n = static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8);
        p += 2;
        need(p, end, 2ull * t.n, "truncated rANS table freqs");
        t.freq.resize(t.n);
        for (uint32_t i = 0; i < t.n; ++i) {
            t.freq[i] = static_cast<uint16_t>(p[0]) |
                        static_cast<uint16_t>(p[1]) << 8;
            p += 2;
        }
        t.finish();
        return t;
    }
};

std::vector<uint8_t> rans_encode(const uint32_t* syms, size_t count,
                                 const Table& t) {
    std::vector<uint8_t> out;
    if (!count) return out;
    uint32_t x = kRansL;
    for (size_t i = count; i > 0; --i) {
        uint32_t s = syms[i - 1];
        uint32_t f = t.freq[s];
        uint32_t x_max = ((kRansL >> kProbBits) << 8) * f;
        while (x >= x_max) {
            out.push_back(static_cast<uint8_t>(x & 0xFF));
            x >>= 8;
        }
        x = ((x / f) << kProbBits) + (x % f) + t.cum[s];
    }
    for (int i = 0; i < 4; ++i) {
        out.push_back(static_cast<uint8_t>(x & 0xFF));
        x >>= 8;
    }
    std::reverse(out.begin(), out.end());
    return out;
}

void rans_decode(const uint8_t* data, size_t size, uint32_t* out,
                 size_t count, const Table& t) {
    if (!count) return;
    if (t.n == 0) corrupt("empty rANS table with nonzero payload");
    if (size < 4) corrupt("truncated rANS stream");
    const uint8_t* p = data;
    const uint8_t* end = data + size;
    uint32_t x = 0;
    for (int i = 0; i < 4; ++i) x = (x << 8) | *p++;
    for (size_t i = 0; i < count; ++i) {
        uint32_t cum = x & (kProbScale - 1);
        uint32_t s = t.lookup[cum];
        out[i] = s;
        x = t.freq[s] * (x >> kProbBits) + cum - t.cum[s];
        while (x < kRansL && p < end) x = (x << 8) | *p++;
    }
}

// rANS with escape (symbol 255 -> varint overflow stream); stream layout:
// [table][enc_sz u32][encoded][ov_sz u32][overflow]
// shared [table][enc_sz u32][encoded] emit over symbols in [0, max_sym]
std::vector<uint8_t> rans_block(const uint32_t* syms, uint32_t count,
                                uint32_t max_sym) {
    std::vector<uint64_t> counts(max_sym + 1, 0);
    for (uint32_t i = 0; i < count; ++i) ++counts[syms[i]];
    Table t;
    t.build(counts);
    auto enc = rans_encode(syms, count, t);
    std::vector<uint8_t> out = t.serialize();
    put_u32(static_cast<uint32_t>(enc.size()), out);
    out.insert(out.end(), enc.begin(), enc.end());
    return out;
}

std::vector<uint8_t> encode_rans_escape(const uint32_t* vals, uint32_t count) {
    constexpr uint32_t kEsc = 255;
    std::vector<uint32_t> syms(count);
    std::vector<uint8_t> overflow;
    uint32_t max_seen = 0;
    for (uint32_t i = 0; i < count; ++i) {
        if (vals[i] >= kEsc) {
            syms[i] = kEsc;
            varint_put(vals[i], overflow);
            max_seen = kEsc;
        } else {
            syms[i] = vals[i];
            max_seen = std::max(max_seen, vals[i]);
        }
    }
    std::vector<uint8_t> out = rans_block(syms.data(), count, max_seen);
    put_u32(static_cast<uint32_t>(overflow.size()), out);
    out.insert(out.end(), overflow.begin(), overflow.end());
    return out;
}

// quant8 layout: [table over 0..255][enc_sz u32][encoded] with NO overflow
// section — byte-compatible with the reference's quant8 chunk writer
// (sparsepress_v2.hpp:351-390; all symbols fit in [0,255] by construction)
std::vector<uint8_t> encode_rans_quant8(const uint32_t* syms, uint32_t count) {
    return rans_block(syms, count, 255);
}

std::vector<uint32_t> decode_rans_escape(const uint8_t* data, size_t size,
                                         uint32_t count,
                                         bool overflow_optional = false) {
    std::vector<uint32_t> out(count, 0);
    if (!size || !count) return out;
    const uint8_t* p = data;
    const uint8_t* end = data + size;
    Table t = Table::deserialize(p, end);
    uint32_t enc_sz = get_u32_checked(p, end);
    need(p, end, enc_sz, "truncated rANS payload");
    rans_decode(p, enc_sz, out.data(), count, t);
    p += enc_sz;
    // overflow_optional (quant8 ONLY): the reference's quant8 encoder
    // (sparsepress_v2.hpp:351-390) writes only [table][enc_sz][encoded]
    // and its decoder treats a stream ending here as "no escapes" —
    // match that so reference-written quant8 chunks decode.  For every
    // OTHER stream the overflow section is mandatory: a missing section
    // there means truncation, and silently treating escape symbols as
    // literal 255 would be a silent misdecode (round-4 review finding).
    if (overflow_optional && static_cast<uint64_t>(end - p) < 4) return out;
    uint32_t ov_sz = get_u32_checked(p, end);
    need(p, end, ov_sz, "truncated overflow stream");
    if (ov_sz) {
        const uint8_t* ov = p;
        const uint8_t* ov_end = p + ov_sz;
        for (uint32_t i = 0; i < count; ++i)
            if (out[i] == 255)
                out[i] = static_cast<uint32_t>(varint_get(ov, ov_end));
    }
    return out;
}

// Byte-shuffled multi-stream rANS for float payloads; layout:
// [n_streams u8] then per stream [table_sz u32][table][enc_sz u32][encoded]
std::vector<uint8_t> encode_byteshuffle(const uint8_t* raw, uint32_t count,
                                        uint32_t bytes_per_value) {
    std::vector<uint8_t> out;
    out.push_back(static_cast<uint8_t>(bytes_per_value));
    std::vector<uint32_t> stream(count);
    for (uint32_t s = 0; s < bytes_per_value; ++s) {
        std::vector<uint64_t> counts(256, 0);
        for (uint32_t k = 0; k < count; ++k) {
            stream[k] = raw[k * bytes_per_value + s];
            ++counts[stream[k]];
        }
        Table t;
        t.build(counts);
        auto tbl = t.serialize();
        auto enc = rans_encode(stream.data(), count, t);
        put_u32(static_cast<uint32_t>(tbl.size()), out);
        out.insert(out.end(), tbl.begin(), tbl.end());
        put_u32(static_cast<uint32_t>(enc.size()), out);
        out.insert(out.end(), enc.begin(), enc.end());
    }
    return out;
}

void decode_byteshuffle(const uint8_t* data, size_t size, uint32_t count,
                        uint8_t* raw_out, uint32_t bytes_per_value) {
    if (!count) return;
    const uint8_t* p = data;
    const uint8_t* end = data + size;
    need(p, end, 1, "truncated byteshuffle header");
    uint32_t n_streams = *p++;
    std::vector<uint32_t> stream(count);
    for (uint32_t s = 0; s < n_streams && s < bytes_per_value; ++s) {
        uint32_t tbl_sz = get_u32_checked(p, end);
        need(p, end, tbl_sz, "truncated byteshuffle table");
        const uint8_t* tp = p;
        Table t = Table::deserialize(tp, p + tbl_sz);
        p += tbl_sz;
        uint32_t enc_sz = get_u32_checked(p, end);
        need(p, end, enc_sz, "truncated byteshuffle payload");
        rans_decode(p, enc_sz, stream.data(), count, t);
        p += enc_sz;
        for (uint32_t k = 0; k < count; ++k)
            raw_out[k * bytes_per_value + s] = static_cast<uint8_t>(stream[k]);
    }
}

// ---------------------------------------------------------------------------
// CRC32 (zlib polynomial 0xEDB88320, reflected) — the footer's file_crc32
// covers every byte before the 16-byte footer (format/checksum.hpp:17-70,
// writer use sparsepress_v2.hpp:861).  Matches python zlib.crc32 so the
// structural golden tests can verify independently.
// ---------------------------------------------------------------------------

static const std::array<uint32_t, 256>& crc32_table() {
    // C++11 magic static: thread-safe one-time init (concurrent first
    // encodes from two threads must not race the table fill)
    static const std::array<uint32_t, 256> table = [] {
        std::array<uint32_t, 256> t{};
        for (uint32_t i = 0; i < 256; ++i) {
            uint32_t c = i;
            for (int j = 0; j < 8; ++j)
                c = (c & 1) ? (0xEDB88320u ^ (c >> 1)) : (c >> 1);
            t[i] = c;
        }
        return t;
    }();
    return table;
}

static uint32_t crc32_bytes(const uint8_t* data, size_t len);

// Verify the v2/v3 footer CRC over everything before the 16-byte footer
// ([metadata_size u32][file_crc32 u32][total_chunks u32]["SPEN"],
// sparsepress_v2.hpp:858-863).  The reference WRITES this CRC but never
// checks it on read; an exhaustive single-byte-flip fuzz (r5) showed 25%
// of payload flips silently misdecoding without it.  Whole-buffer decodes
// verify unconditionally; the chunked loader verifies once at open.
static void verify_footer_crc(const uint8_t* buf, uint64_t len) {
    if (len < 16) corrupt("buffer too small for footer");
    if (std::memcmp(buf + len - 4, "SPEN", 4) != 0)
        corrupt("missing SPEN footer");
    uint32_t want;
    std::memcpy(&want, buf + len - 12, 4);
    if (crc32_bytes(buf, static_cast<size_t>(len - 16)) != want)
        corrupt("file CRC32 mismatch");
}

// slicing-by-8 tables: table[0] is the classic byte table; table[k] maps a
// byte processed k positions earlier.  ~4x the byte-at-a-time throughput —
// the read-side CRC verify (r5) made the serial CRC pass part of every
// decode, so it must not bound the multithreaded decode's scaling.
static const std::array<std::array<uint32_t, 256>, 8>& crc32_tables8() {
    static const auto tables = [] {
        std::array<std::array<uint32_t, 256>, 8> t{};
        t[0] = crc32_table();
        for (int i = 0; i < 256; ++i) {
            uint32_t c = t[0][i];
            for (int k = 1; k < 8; ++k) {
                c = t[0][c & 0xFF] ^ (c >> 8);
                t[k][i] = c;
            }
        }
        return t;
    }();
    return tables;
}

static uint32_t crc32_bytes(const uint8_t* data, size_t len) {
    const auto& t8 = crc32_tables8();
    uint32_t crc = 0xFFFFFFFFu;
    size_t i = 0;
    for (; i + 8 <= len; i += 8) {
        uint32_t lo, hi;
        std::memcpy(&lo, data + i, 4);
        std::memcpy(&hi, data + i + 4, 4);
        lo ^= crc;
        crc = t8[7][lo & 0xFF] ^ t8[6][(lo >> 8) & 0xFF]
            ^ t8[5][(lo >> 16) & 0xFF] ^ t8[4][lo >> 24]
            ^ t8[3][hi & 0xFF] ^ t8[2][(hi >> 8) & 0xFF]
            ^ t8[1][(hi >> 16) & 0xFF] ^ t8[0][hi >> 24];
    }
    for (; i < len; ++i)
        crc = t8[0][(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
    return crc ^ 0xFFFFFFFFu;
}


// ---------------------------------------------------------------------------
// v2 container structs (layout mirrors the published 128-byte header)
// ---------------------------------------------------------------------------

#pragma pack(push, 1)
struct Header {
    uint8_t magic[4];
    uint16_t version;
    uint16_t header_size;
    uint32_t m, n;
    uint64_t nnz;
    uint32_t chunk_cols;
    uint32_t num_chunks;
    uint32_t num_tables;
    uint32_t table_log;
    uint8_t value_type;
    uint8_t compression_level;
    uint8_t row_sorted;
    uint8_t col_sorted;
    uint32_t most_common_value;
    uint64_t chunk_index_offset;
    uint64_t tables_offset;
    uint64_t data_offset;
    uint64_t transpose_offset;
    uint64_t metadata_offset;
    uint32_t max_value;
    float density;
    uint8_t reserved[32];
};
struct ChunkDesc {
    uint32_t col_start;
    uint32_t num_cols;
    uint32_t nnz;
    uint32_t stream_offset[2];
    uint32_t stream_size[2];
    uint32_t decoded_gap_bytes;
    uint32_t decoded_value_bytes;
    float quant_scale;
    float quant_offset;
    uint32_t reserved;
};
#pragma pack(pop)

static_assert(sizeof(Header) == 128, "header must be 128 bytes");
static_assert(sizeof(ChunkDesc) == 48, "chunk descriptor must be 48 bytes");

enum VType : uint8_t { VT_U8 = 0, VT_U16 = 1, VT_U32 = 2, VT_F32 = 3,
                       VT_F16 = 4, VT_Q8 = 5, VT_F64 = 6 };

static uint32_t vt_size(uint8_t vt) {
    switch (vt) {
        case VT_U8: case VT_Q8: return 1;
        case VT_U16: case VT_F16: return 2;
        case VT_U32: case VT_F32: return 4;
        case VT_F64: return 8;
        default: return 0;
    }
}

thread_local std::string g_error;

Header read_header_v2(const uint8_t* buf, uint64_t len) {
    if (len < sizeof(Header)) corrupt("buffer smaller than header");
    Header h;
    std::memcpy(&h, buf, sizeof(Header));
    if (std::memcmp(h.magic, "SPRZ", 4) != 0) corrupt("bad magic");
    if (h.version != 2) corrupt("unsupported version");
    return h;
}

// resolved + validated view of the forward or transpose chunk stream
struct StreamView {
    uint64_t desc_off, data_off;
    uint32_t num_chunks, ncols, nrows;
};

StreamView resolve_stream(const Header& h, const uint8_t* buf, uint64_t len,
                          int transpose) {
    StreamView v;
    if (transpose) {
        if (!h.transpose_offset) corrupt("no transpose stream present");
        if (h.transpose_offset > len || len - h.transpose_offset < 4)
            corrupt("transpose offset out of range");
        v.num_chunks = get_u32(buf + h.transpose_offset);
        v.desc_off = h.transpose_offset + 4;
        v.ncols = h.m; v.nrows = h.n;
    } else {
        v.num_chunks = h.num_chunks;
        v.desc_off = h.chunk_index_offset;
        v.ncols = h.n; v.nrows = h.m;
    }
    if (v.desc_off > len ||
        static_cast<uint64_t>(v.num_chunks) * sizeof(ChunkDesc) >
            len - v.desc_off)
        corrupt("chunk index out of range");
    v.data_off = transpose
        ? v.desc_off + static_cast<uint64_t>(v.num_chunks) * sizeof(ChunkDesc)
        : h.data_offset;
    if (v.data_off > len) corrupt("data offset out of range");
    return v;
}

ChunkDesc load_desc(const uint8_t* buf, uint64_t len, const StreamView& v,
                    uint32_t idx) {
    if (idx >= v.num_chunks) corrupt("chunk index out of range");
    ChunkDesc d;
    std::memcpy(&d, buf + v.desc_off + idx * sizeof(ChunkDesc), sizeof(d));
    uint64_t avail = len - v.data_off;
    for (int s = 0; s < 2; ++s)
        if (d.stream_offset[s] > avail ||
            d.stream_size[s] > avail - d.stream_offset[s])
            corrupt("chunk stream out of range");
    if (d.col_start > v.ncols || d.num_cols > v.ncols - d.col_start)
        corrupt("chunk columns out of range");
    return d;
}

// decode gaps stream into row indices + per-column counts.  col_counts and
// row indices come from the file and size caller-allocated buffers — they
// are validated against the chunk descriptor (nnz) and matrix dims (nrows).
void decode_gaps(const uint8_t* gp, size_t gap_size, const ChunkDesc& d,
                 uint32_t nrows,
                 std::vector<uint32_t>& col_counts,
                 std::vector<uint32_t>& rows) {
    const uint8_t* end = gp + gap_size;
    uint32_t cc_size = get_u32_checked(gp, end);
    need(gp, end, cc_size, "truncated column-count stream");
    const uint8_t* cc = gp;
    col_counts.resize(d.num_cols);
    uint64_t total = 0;
    {
        const uint8_t* scan = cc;
        for (uint32_t j = 0; j < d.num_cols; ++j) {
            col_counts[j] = static_cast<uint32_t>(varint_get(scan, cc + cc_size));
            total += col_counts[j];
        }
    }
    if (total != d.nnz) corrupt("column counts disagree with chunk nnz");
    rows.resize(d.nnz);
    if (!d.nnz) return;
    auto gaps = decode_rans_escape(gp + cc_size,
                                   static_cast<size_t>(end - gp) - cc_size,
                                   d.nnz);
    uint32_t idx = 0;
    for (uint32_t j = 0; j < d.num_cols; ++j) {
        uint64_t prev = 0;
        for (uint32_t k = 0; k < col_counts[j]; ++k) {
            uint64_t row = prev + gaps[idx];
            if (row >= nrows) corrupt("row index out of range");
            rows[idx] = static_cast<uint32_t>(row);
            prev = row + 1;
            ++idx;
        }
    }
}

inline float half_to_float(uint16_t h) {
    uint32_t sign = (h >> 15) & 1, exp = (h >> 10) & 0x1F, man = h & 0x3FF;
    uint32_t out;
    if (exp == 0) {
        if (!man) out = sign << 31;
        else {
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; --exp; }
            man &= 0x3FF;
            out = (sign << 31) | (exp << 23) | (man << 13);
        }
    } else if (exp == 31) {
        out = (sign << 31) | (0xFFu << 23) | (man << 13);
    } else {
        out = (sign << 31) | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &out, 4);
    return f;
}

inline uint16_t float_to_half(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 31) & 1;
    int32_t exp = static_cast<int32_t>((x >> 23) & 0xFF) - 127 + 15;
    uint32_t man = x & 0x7FFFFF;
    if (exp <= 0) return static_cast<uint16_t>(sign << 15);
    if (exp >= 31) return static_cast<uint16_t>((sign << 15) | (31 << 10));
    return static_cast<uint16_t>((sign << 15) | (exp << 10) | (man >> 13));
}

void decode_values(const uint8_t* vp, size_t vsize, const ChunkDesc& d,
                   uint8_t vtype, float* out) {
    switch (vtype) {
        case VT_U8: case VT_U16: case VT_U32: {
            auto iv = decode_rans_escape(vp, vsize, d.nnz);
            for (uint32_t k = 0; k < d.nnz; ++k)
                out[k] = static_cast<float>(iv[k]);
            break;
        }
        case VT_F32: {
            decode_byteshuffle(vp, vsize, d.nnz,
                               reinterpret_cast<uint8_t*>(out), 4);
            break;
        }
        case VT_F16: {
            std::vector<uint16_t> h(d.nnz);
            decode_byteshuffle(vp, vsize, d.nnz,
                               reinterpret_cast<uint8_t*>(h.data()), 2);
            for (uint32_t k = 0; k < d.nnz; ++k) out[k] = half_to_float(h[k]);
            break;
        }
        case VT_Q8: {
            auto q = decode_rans_escape(vp, vsize, d.nnz,
                                        /*overflow_optional=*/true);
            for (uint32_t k = 0; k < d.nnz; ++k)
                out[k] = d.quant_offset + d.quant_scale * static_cast<float>(q[k]);
            break;
        }
        case VT_F64: {
            std::vector<double> dv(d.nnz);
            decode_byteshuffle(vp, vsize, d.nnz,
                               reinterpret_cast<uint8_t*>(dv.data()), 8);
            for (uint32_t k = 0; k < d.nnz; ++k)
                out[k] = static_cast<float>(dv[k]);
            break;
        }
        default:
            throw std::runtime_error("unsupported value type " +
                                     std::to_string(vtype));
    }
}

// ---------------------------------------------------------------------------
// v1 whole-matrix legacy format (reference streampress/sparsepress.hpp:39-732
// and format/header.hpp).  72-byte header, one rANS-escape stream each for
// structure (row-index gaps) and values, optional density/value predictors,
// column-XOR-delta byte-shuffled f64 fallback; CRC32 over the payload.
// ---------------------------------------------------------------------------
namespace v1 {

constexpr size_t kHeaderSize = 72;
constexpr uint16_t kFlagDelta = 0x0001;
constexpr uint16_t kFlagVPred = 0x0002;
constexpr uint16_t kFlagInteger = 0x0004;

// v1 value types (transform/value_map.hpp:20-26); distinct numbering from v2
enum V1Type : uint8_t { V1_U8 = 0, V1_U16 = 1, V1_U32 = 2, V1_F64 = 3 };

struct HeaderV1 {
    uint16_t version = 1, flags = 0;
    uint32_t m = 0, n = 0;
    uint64_t nnz = 0;
    uint32_t max_value = 0;
    uint8_t value_type = 0;
    uint16_t rice_block_size = 1024, density_blocks = 128;
    uint64_t prng_seed = 0x5A434F4D50ULL;
    uint32_t model_size = 0, struct_size = 0, values_size = 0;
    uint32_t col_counts_size = 0, struct_k_size = 0, crc32 = 0;

    std::vector<uint8_t> serialize() const {
        std::vector<uint8_t> buf(kHeaderSize, 0);
        uint8_t* p = buf.data();
        std::memcpy(p, "SPRZ", 4); p += 4;
        std::memcpy(p, &version, 2); p += 2;
        std::memcpy(p, &flags, 2); p += 2;
        std::memcpy(p, &m, 4); p += 4;
        std::memcpy(p, &n, 4); p += 4;
        std::memcpy(p, &nnz, 8); p += 8;
        std::memcpy(p, &max_value, 4); p += 4;
        *p++ = value_type;
        std::memcpy(p, &rice_block_size, 2); p += 2;
        std::memcpy(p, &density_blocks, 2); p += 2;
        ++p;  // reserved1
        std::memcpy(p, &prng_seed, 8); p += 8;
        std::memcpy(p, &model_size, 4); p += 4;
        std::memcpy(p, &struct_size, 4); p += 4;
        std::memcpy(p, &values_size, 4); p += 4;
        std::memcpy(p, &col_counts_size, 4); p += 4;
        std::memcpy(p, &struct_k_size, 4); p += 4;
        std::memcpy(p, &crc32, 4); p += 4;
        return buf;
    }

    static HeaderV1 parse(const uint8_t* buf, uint64_t len) {
        if (len < kHeaderSize) corrupt("buffer smaller than v1 header");
        HeaderV1 h;
        const uint8_t* p = buf;
        if (std::memcmp(p, "SPRZ", 4) != 0) corrupt("bad magic");
        p += 4;
        std::memcpy(&h.version, p, 2); p += 2;
        if (h.version != 1) corrupt("not a v1 stream");
        std::memcpy(&h.flags, p, 2); p += 2;
        std::memcpy(&h.m, p, 4); p += 4;
        std::memcpy(&h.n, p, 4); p += 4;
        std::memcpy(&h.nnz, p, 8); p += 8;
        std::memcpy(&h.max_value, p, 4); p += 4;
        h.value_type = *p++;
        std::memcpy(&h.rice_block_size, p, 2); p += 2;
        std::memcpy(&h.density_blocks, p, 2); p += 2;
        ++p;  // reserved1
        std::memcpy(&h.prng_seed, p, 8); p += 8;
        std::memcpy(&h.model_size, p, 4); p += 4;
        std::memcpy(&h.struct_size, p, 4); p += 4;
        std::memcpy(&h.values_size, p, 4); p += 4;
        std::memcpy(&h.col_counts_size, p, 4); p += 4;
        std::memcpy(&h.struct_k_size, p, 4); p += 4;
        std::memcpy(&h.crc32, p, 4); p += 4;
        // v1 is a whole-matrix format whose streams carry at most u32
        // symbols; the header nnz is u64 on disk, and a crafted value
        // above u32 would truncate the symbol-vector size while the
        // column pointers (also attacker-controlled, CRC covers payload
        // only) still index the full range — OOB reads (round-4 review)
        if (h.nnz > 0xFFFFFFFFull)
            corrupt("v1 nnz exceeds uint32 (not a valid v1 stream)");
        if (static_cast<uint64_t>(h.m) * h.n < h.nnz)
            corrupt("v1 nnz exceeds m*n");
        return h;
    }
};

// Row-density block model (model/predictor.hpp:33-105): predicted gap at row
// r is the geometric-expected (1-d)/d for the density of r's row block.
struct DensityModel {
    uint32_t n_blocks = 0, block_size = 1;
    std::vector<uint16_t> q;  // density * 65535

    void build(const std::vector<uint32_t>& row_nnz, uint32_t m, uint32_t n,
               uint32_t hint) {
        n_blocks = std::min(hint, m);
        if (n_blocks == 0) n_blocks = 1;
        block_size = (m + n_blocks - 1) / n_blocks;
        q.resize(n_blocks);
        for (uint32_t b = 0; b < n_blocks; ++b) {
            uint32_t r0 = b * block_size;
            uint32_t r1 = std::min(r0 + block_size, m);
            uint64_t bn = 0;
            for (uint32_t r = r0; r < r1; ++r) bn += row_nnz[r];
            double d = static_cast<double>(bn) /
                       (static_cast<double>(r1 - r0) * n);
            d = std::min(std::max(d, 1.0 / 65535.0), 1.0);
            q[b] = static_cast<uint16_t>(d * 65535.0 + 0.5);
            if (q[b] == 0) q[b] = 1;
        }
    }

    int32_t predict_gap(uint32_t row) const {
        uint32_t b = row / block_size;
        if (b >= n_blocks) b = n_blocks - 1;
        double d = static_cast<double>(q[b]) / 65535.0;
        return static_cast<int32_t>(std::lround((1.0 - d) / d));
    }

    void serialize(std::vector<uint8_t>& out) const {
        varint_put(n_blocks, out);
        varint_put(block_size, out);
        for (uint32_t b = 0; b < n_blocks; ++b) {
            out.push_back(static_cast<uint8_t>(q[b] & 0xFF));
            out.push_back(static_cast<uint8_t>((q[b] >> 8) & 0xFF));
        }
    }

    static DensityModel deserialize(const uint8_t*& p, const uint8_t* end) {
        DensityModel dm;
        dm.n_blocks = static_cast<uint32_t>(varint_get(p, end));
        dm.block_size = static_cast<uint32_t>(varint_get(p, end));
        if (dm.block_size == 0) corrupt("density model zero block size");
        need(p, end, static_cast<uint64_t>(dm.n_blocks) * 2,
             "truncated density model");
        dm.q.resize(dm.n_blocks);
        for (uint32_t b = 0; b < dm.n_blocks; ++b) {
            dm.q[b] = static_cast<uint16_t>(p[0]) |
                      (static_cast<uint16_t>(p[1]) << 8);
            if (dm.q[b] == 0) corrupt("density model zero density");
            p += 2;
        }
        if (dm.n_blocks == 0) corrupt("density model has no blocks");
        return dm;
    }
};

// Independence-model value predictor (model/predictor.hpp:116-196):
// predicted = max(1, round(row_mean * col_nnz / global_col_mean)),
// row means quantized x256, delta+zigzag serialized.
struct ValuePredictor {
    std::vector<uint16_t> row_mean_q;
    double global_col_mean = 1.0;

    void build(const std::vector<uint32_t>& row_nnz,
               const std::vector<double>& row_sum,
               const std::vector<uint32_t>& col_nnz, uint32_t m, uint32_t n) {
        row_mean_q.resize(m);
        for (uint32_t r = 0; r < m; ++r) {
            double rm = row_nnz[r] ? row_sum[r] / row_nnz[r] : 1.0;
            uint32_t qv = static_cast<uint32_t>(rm * 256.0 + 0.5);
            row_mean_q[r] = static_cast<uint16_t>(std::min(qv, 65535u));
        }
        uint64_t total = 0;
        for (uint32_t j = 0; j < n; ++j) total += col_nnz[j];
        global_col_mean = n ? static_cast<double>(total) / n : 1.0;
        if (global_col_mean < 1.0) global_col_mean = 1.0;
        uint32_t gq = static_cast<uint32_t>(global_col_mean * 256.0 + 0.5);
        global_col_mean = static_cast<double>(gq) / 256.0;
    }

    uint32_t predict(uint32_t row, uint32_t col_nnz) const {
        double rm = static_cast<double>(row_mean_q[row]) / 256.0;
        double ratio = static_cast<double>(col_nnz) / global_col_mean;
        int32_t pred = static_cast<int32_t>(std::lround(rm * ratio));
        return static_cast<uint32_t>(std::max(1, pred));
    }

    void serialize(std::vector<uint8_t>& out) const {
        uint32_t m = static_cast<uint32_t>(row_mean_q.size());
        varint_put(m, out);
        uint32_t gq = static_cast<uint32_t>(global_col_mean * 256.0 + 0.5);
        varint_put(gq, out);
        int32_t prev = 0;
        for (uint32_t r = 0; r < m; ++r) {
            int64_t d = static_cast<int32_t>(row_mean_q[r]) - prev;
            varint_put(static_cast<uint64_t>((d << 1) ^ (d >> 63)), out);
            prev = static_cast<int32_t>(row_mean_q[r]);
        }
    }

    static ValuePredictor deserialize(const uint8_t*& p, const uint8_t* end,
                                      uint32_t expect_m) {
        ValuePredictor vp;
        uint32_t m = static_cast<uint32_t>(varint_get(p, end));
        if (m != expect_m) corrupt("value predictor row count mismatch");
        uint32_t gq = static_cast<uint32_t>(varint_get(p, end));
        vp.global_col_mean = static_cast<double>(gq) / 256.0;
        if (vp.global_col_mean < 1.0 / 256.0)
            corrupt("value predictor zero column mean");
        vp.row_mean_q.resize(m);
        int32_t prev = 0;
        for (uint32_t r = 0; r < m; ++r) {
            uint64_t zz = varint_get(p, end);
            int64_t d = static_cast<int64_t>(zz >> 1) ^
                        -static_cast<int64_t>(zz & 1);
            prev += static_cast<int32_t>(d);
            vp.row_mean_q[r] = static_cast<uint16_t>(prev & 0xFFFF);
        }
        return vp;
    }
};

// Full-matrix decode into caller-allocated CSC arrays.
void decode(const uint8_t* buf, uint64_t len, int64_t* p_out, int32_t* i_out,
            float* x_out) {
    HeaderV1 h = HeaderV1::parse(buf, len);
    if (len < kHeaderSize ||
        crc32_bytes(buf + kHeaderSize, static_cast<size_t>(len - kHeaderSize))
            != h.crc32)
        corrupt("v1 CRC32 mismatch");

    // section bounds (order: model, col_counts, struct_k, struct, values —
    // sparsepress.hpp:383-386)
    uint64_t avail = len - kHeaderSize;
    uint64_t want = static_cast<uint64_t>(h.model_size) + h.col_counts_size +
                    h.struct_k_size + h.struct_size + h.values_size;
    if (want > avail) corrupt("v1 sections exceed buffer");
    const uint8_t* model_p = buf + kHeaderSize;
    const uint8_t* cc_p = model_p + h.model_size;
    const uint8_t* struct_p = cc_p + h.col_counts_size + h.struct_k_size;
    const uint8_t* values_p = struct_p + h.struct_size;

    bool use_delta = (h.flags & kFlagDelta) != 0;
    bool use_vpred = (h.flags & kFlagVPred) != 0;

    DensityModel dm;
    ValuePredictor vp;
    {
        const uint8_t* mp = model_p;
        const uint8_t* mend = model_p + h.model_size;
        if (use_delta) dm = DensityModel::deserialize(mp, mend);
        if (use_vpred) vp = ValuePredictor::deserialize(mp, mend, h.m);
    }

    // column counts -> column pointers
    {
        const uint8_t* cp = cc_p;
        const uint8_t* cend = cc_p + h.col_counts_size;
        p_out[0] = 0;
        uint64_t total = 0;
        for (uint32_t j = 0; j < h.n; ++j) {
            uint64_t c = varint_get(cp, cend);
            total += c;
            if (total > h.nnz) corrupt("v1 column counts exceed nnz");
            p_out[j + 1] = static_cast<int64_t>(total);
        }
        if (total != h.nnz) corrupt("v1 column counts disagree with nnz");
    }

    if (h.nnz == 0) return;

    // structure: rANS+escape gap stream -> row indices
    {
        auto syms = decode_rans_escape(struct_p, h.struct_size,
                                       static_cast<uint32_t>(h.nnz));
        for (uint32_t j = 0; j < h.n; ++j) {
            int64_t c0 = p_out[j], c1 = p_out[j + 1];
            if (use_delta) {
                // reference reconstructs indices[0]=gap, indices[k]=
                // prev+1+gap with the predictor's cursor cur += gap+1 from
                // 0 — cur always equals prev_row+1, i.e. the next index is
                // cur+gap (sparsepress.hpp:549-575, delta.hpp:38-45)
                uint64_t cur = 0;
                for (int64_t k = c0; k < c1; ++k) {
                    uint32_t zz = syms[k];
                    int32_t res = static_cast<int32_t>((zz >> 1) ^
                                                       (-(zz & 1)));
                    // cur <= h.m here (bounded by the r<m check below);
                    // predict_gap clamps its block index internally
                    int32_t gap = std::max(
                        0, res + dm.predict_gap(static_cast<uint32_t>(cur)));
                    uint64_t r = cur + static_cast<uint32_t>(gap);
                    if (r >= h.m) corrupt("v1 row index out of range");
                    i_out[k] = static_cast<int32_t>(r);
                    cur = r + 1;
                }
            } else {
                uint64_t prev = 0;
                for (int64_t k = c0; k < c1; ++k) {
                    uint64_t r = (k == c0)
                        ? static_cast<uint64_t>(syms[k])
                        : prev + 1 + syms[k];
                    if (r >= h.m) corrupt("v1 row index out of range");
                    i_out[k] = static_cast<int32_t>(r);
                    prev = r;
                }
            }
        }
    }

    // values
    if (h.value_type != V1_F64) {
        auto syms = decode_rans_escape(values_p, h.values_size,
                                       static_cast<uint32_t>(h.nnz));
        if (use_vpred) {
            for (uint32_t j = 0; j < h.n; ++j) {
                int64_t c0 = p_out[j], c1 = p_out[j + 1];
                uint32_t cn = static_cast<uint32_t>(c1 - c0);
                for (int64_t k = c0; k < c1; ++k) {
                    uint32_t zz = syms[k];
                    int32_t res = static_cast<int32_t>((zz >> 1) ^
                                                       (~(zz & 1) + 1));
                    int32_t actual = res + static_cast<int32_t>(vp.predict(
                        static_cast<uint32_t>(i_out[k]), cn));
                    x_out[k] = static_cast<float>(std::max(0, actual));
                }
            }
        } else {
            for (uint64_t k = 0; k < h.nnz; ++k)
                x_out[k] = static_cast<float>(syms[k]);
        }
    } else {
        // f64 path: byte-shuffled streams of column-XOR-delta'd doubles
        std::vector<uint64_t> xv(h.nnz);
        decode_byteshuffle(values_p, h.values_size,
                           static_cast<uint32_t>(h.nnz),
                           reinterpret_cast<uint8_t*>(xv.data()), 8);
        for (uint32_t j = 0; j < h.n; ++j) {
            int64_t c0 = p_out[j], c1 = p_out[j + 1];
            uint64_t acc = 0;
            for (int64_t k = c0; k < c1; ++k) {
                acc = (k == c0) ? xv[k] : (xv[k] ^ acc);
                double d;
                std::memcpy(&d, &acc, 8);
                x_out[k] = static_cast<float>(d);
            }
        }
    }
}

// Encode CSC (float32 values) into a v1 buffer; mirrors the reference
// compressor's phases (sparsepress.hpp:38-425) so reference decoders read
// the output.  use_delta/use_vpred match R st defaults (streampress.R:70).
std::vector<uint8_t> encode(uint32_t m, uint32_t n, const int64_t* p,
                            const int32_t* i, const float* x, int use_delta,
                            int use_vpred) {
    uint64_t nnz = static_cast<uint64_t>(p[n]);
    // mirror of the decode-side guard: v1 symbol streams are u32-count
    if (nnz > 0xFFFFFFFFull)
        throw std::runtime_error(
            "spz v1 cannot encode > 2^32-1 nonzeros; use the chunked v2 "
            "format (st_write)");

    // analyze (model/analyzer.hpp essentials)
    std::vector<uint32_t> row_nnz(m, 0), col_nnz(n, 0);
    std::vector<double> row_sum(m, 0.0);
    bool all_int = true, all_nonneg = true;
    double max_val = 0;
    for (uint32_t j = 0; j < n; ++j) {
        col_nnz[j] = static_cast<uint32_t>(p[j + 1] - p[j]);
        for (int64_t k = p[j]; k < p[j + 1]; ++k) {
            double v = static_cast<double>(x[k]);
            ++row_nnz[static_cast<uint32_t>(i[k])];
            row_sum[static_cast<uint32_t>(i[k])] += v;
            if (v < 0) all_nonneg = false;
            if (v != std::floor(v)) all_int = false;
            max_val = std::max(max_val, v);
        }
    }
    bool int_path = all_int && all_nonneg && max_val <= 4294967295.0;
    uint32_t max_value = int_path ? static_cast<uint32_t>(max_val) : 0;

    bool delta_on = use_delta && nnz > 0;
    bool vpred_on = use_vpred && int_path && nnz > 0;

    HeaderV1 h;
    h.m = m; h.n = n; h.nnz = nnz;
    h.max_value = max_value;
    if (!int_path) h.value_type = V1_F64;
    else if (max_value <= 255) h.value_type = V1_U8;
    else if (max_value <= 65535) h.value_type = V1_U16;
    else h.value_type = V1_U32;
    if (delta_on) h.flags |= kFlagDelta;
    if (vpred_on) h.flags |= kFlagVPred;
    if (all_int && all_nonneg) h.flags |= kFlagInteger;

    DensityModel dm;
    ValuePredictor vp;
    std::vector<uint8_t> model;
    if (delta_on) {
        dm.build(row_nnz, m, n, h.density_blocks);
        dm.serialize(model);
    }
    if (vpred_on) {
        vp.build(row_nnz, row_sum, col_nnz, m, n);
        vp.serialize(model);
    }

    std::vector<uint8_t> cc;
    for (uint32_t j = 0; j < n; ++j)
        varint_put(static_cast<uint64_t>(p[j + 1] - p[j]), cc);

    // structure symbols: per-column gaps, optionally residual vs predictor
    std::vector<uint8_t> struct_enc;
    if (nnz > 0) {
        std::vector<uint32_t> syms(nnz);
        for (uint32_t j = 0; j < n; ++j) {
            uint32_t prev = 0, cur = 0;
            for (int64_t k = p[j]; k < p[j + 1]; ++k) {
                uint32_t row = static_cast<uint32_t>(i[k]);
                // same strict-monotonic guard as the v2 encoder: a
                // duplicate/unsorted row wraps the u32 gap and writes a
                // CRC-valid file that silently misdecodes (round-4 review)
                if (row < prev || row >= m)
                    throw std::runtime_error(
                        "unsorted, duplicate, or out-of-range row indices "
                        "in CSC input (call sum_duplicates/sort_indices "
                        "first)");
                uint32_t gap = row - prev;
                prev = row + 1;
                if (delta_on) {
                    int32_t res = static_cast<int32_t>(gap) -
                                  dm.predict_gap(cur);
                    syms[k] = static_cast<uint32_t>((res << 1) ^ (res >> 31));
                    cur += gap + 1;
                } else {
                    syms[k] = gap;
                }
            }
        }
        struct_enc = encode_rans_escape(syms.data(),
                                        static_cast<uint32_t>(nnz));
    }

    // values
    std::vector<uint8_t> val_enc;
    if (nnz > 0 && int_path) {
        std::vector<uint32_t> syms(nnz);
        for (uint32_t j = 0; j < n; ++j) {
            uint32_t cn = static_cast<uint32_t>(p[j + 1] - p[j]);
            for (int64_t k = p[j]; k < p[j + 1]; ++k) {
                uint32_t iv = static_cast<uint32_t>(
                    static_cast<double>(x[k]));
                if (vpred_on) {
                    int32_t res = static_cast<int32_t>(iv) -
                                  static_cast<int32_t>(vp.predict(
                                      static_cast<uint32_t>(i[k]), cn));
                    syms[k] = static_cast<uint32_t>((res << 1) ^ (res >> 31));
                } else {
                    syms[k] = iv;
                }
            }
        }
        val_enc = encode_rans_escape(syms.data(), static_cast<uint32_t>(nnz));
    } else if (nnz > 0) {
        std::vector<uint64_t> xv(nnz);
        for (uint32_t j = 0; j < n; ++j) {
            uint64_t prev = 0;
            for (int64_t k = p[j]; k < p[j + 1]; ++k) {
                double d = static_cast<double>(x[k]);
                uint64_t raw;
                std::memcpy(&raw, &d, 8);
                xv[k] = (k == p[j]) ? raw : (raw ^ prev);
                prev = raw;
            }
        }
        val_enc = encode_byteshuffle(
            reinterpret_cast<const uint8_t*>(xv.data()),
            static_cast<uint32_t>(nnz), 8);
    }

    h.model_size = static_cast<uint32_t>(model.size());
    h.col_counts_size = static_cast<uint32_t>(cc.size());
    h.struct_k_size = 0;
    h.struct_size = static_cast<uint32_t>(struct_enc.size());
    h.values_size = static_cast<uint32_t>(val_enc.size());

    std::vector<uint8_t> out;
    out.reserve(kHeaderSize + model.size() + cc.size() + struct_enc.size() +
                val_enc.size());
    auto hb = h.serialize();
    out.insert(out.end(), hb.begin(), hb.end());
    out.insert(out.end(), model.begin(), model.end());
    out.insert(out.end(), cc.begin(), cc.end());
    out.insert(out.end(), struct_enc.begin(), struct_enc.end());
    out.insert(out.end(), val_enc.begin(), val_enc.end());
    h.crc32 = crc32_bytes(out.data() + kHeaderSize, out.size() - kHeaderSize);
    hb = h.serialize();
    std::memcpy(out.data(), hb.data(), kHeaderSize);
    return out;
}

}  // namespace v1

}  // namespace

// peek the container version without full validation — one source of
// truth: the exported spz_version ("SPRZ" + u16; every real header is
// >= 72 bytes so the min-length 8 is safe for sniffing too)
extern "C" int spz_version(const uint8_t* buf, uint64_t len);

namespace {
inline int peek_version(const uint8_t* buf, uint64_t len) {
    return spz_version(buf, len);
}
}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

const char* spz_last_error() { return g_error.c_str(); }

// (spz_version — "SPRZ" + u16 container version peek — is defined once,
// next to the v3 entry points below.)

// v1 whole-matrix encode: returns encoded size, or -1 on error. Call with
// out=nullptr to size, then again with a buffer of at least that size.
// use_delta/use_vpred toggle the density-model gap predictor and the
// independence value predictor (reference sparsepress.hpp:38-425 defaults).
int64_t spz_encode_v1(uint32_t m, uint32_t n, const int64_t* p,
                      const int32_t* i, const float* x, int use_delta,
                      int use_vpred, uint8_t* out, uint64_t out_cap) {
    try {
        auto buf = v1::encode(m, n, p, i, x, use_delta, use_vpred);
        if (out) {
            if (buf.size() > out_cap) corrupt("v1 output buffer too small");
            std::memcpy(out, buf.data(), buf.size());
        }
        return static_cast<int64_t>(buf.size());
    } catch (const std::exception& e) {
        g_error = e.what();
        return -1;
    }
}

// Parse header: returns 0 on success, fills m, n, nnz, value_type,
// has_transpose (0/1).  v1 value types are reported in the v2 numbering
// (u8/16/32 map directly; v1 FLOAT64 -> 6).
int spz_info(const uint8_t* buf, uint64_t len, uint32_t* m, uint32_t* n,
             uint64_t* nnz, uint8_t* value_type, uint8_t* has_transpose) {
    try {
        if (peek_version(buf, len) == 1) {
            v1::HeaderV1 h = v1::HeaderV1::parse(buf, len);
            *m = h.m; *n = h.n; *nnz = h.nnz;
            *value_type = (h.value_type == v1::V1_F64)
                              ? static_cast<uint8_t>(VT_F64)
                              : h.value_type;
            *has_transpose = 0;  // v1 has no transpose stream
            return 0;
        }
        Header h = read_header_v2(buf, len);
        *m = h.m; *n = h.n; *nnz = h.nnz;
        *value_type = h.value_type;
        *has_transpose = h.transpose_offset != 0;
        return 0;
    } catch (const std::exception& e) {
        g_error = e.what();
        return -1;
    }
}

// Full decode into caller-allocated CSC arrays:
//   p: (n+1) int64, i: (nnz) int32, x: (nnz) float32
// transpose=1 decodes the embedded transpose stream instead (dims swap:
// caller must size arrays for (n_T = m) columns).
int spz_decode(const uint8_t* buf, uint64_t len, int transpose,
               int64_t* p_out, int32_t* i_out, float* x_out) {
    try {
        if (peek_version(buf, len) == 1) {
            if (transpose) corrupt("v1 has no transpose stream");
            v1::decode(buf, len, p_out, i_out, x_out);
            return 0;
        }
        Header h = read_header_v2(buf, len);
        StreamView v = resolve_stream(h, buf, len, transpose);

        // i_out/x_out are caller-allocated to h.nnz entries and p_out to
        // (ncols+1): every chunk write is bounded by those sizes below
        uint64_t out_nnz = 0;
        const uint8_t* base = buf + v.data_off;
        for (uint32_t c = 0; c < v.num_chunks; ++c) {
            ChunkDesc d = load_desc(buf, len, v, c);
            if (d.nnz > h.nnz - out_nnz)
                corrupt("chunk nnz exceeds header nnz");
            std::vector<uint32_t> col_counts, rows;
            decode_gaps(base + d.stream_offset[0], d.stream_size[0], d,
                        v.nrows, col_counts, rows);
            for (uint32_t j = 0; j < d.num_cols; ++j) {
                p_out[d.col_start + j] = static_cast<int64_t>(out_nnz);
                out_nnz += col_counts[j];
            }
            // row indices
            std::memcpy(i_out + (out_nnz - d.nnz), rows.data(),
                        d.nnz * sizeof(int32_t));
            decode_values(base + d.stream_offset[1], d.stream_size[1], d,
                          h.value_type, x_out + (out_nnz - d.nnz));
        }
        if (out_nnz != h.nnz) corrupt("total chunk nnz disagrees with header");
        p_out[v.ncols] = static_cast<int64_t>(out_nnz);
        return 0;
    } catch (const std::exception& e) {
        g_error = e.what();
        return -1;
    }
}

// Multithreaded decode.  Chunks are independent except for the output
// offsets, which are prefix sums of the chunk nnz counts: a serial
// descriptor pass computes (and validates) every chunk's slice, then a
// work-stealing pool rANS-decodes chunks straight into their slices.
// n_threads <= 0 means hardware_concurrency.
int spz_decode_mt(const uint8_t* buf, uint64_t len, int transpose,
                  int64_t* p_out, int32_t* i_out, float* x_out,
                  int n_threads) {
    try {
        if (peek_version(buf, len) == 1) {
            // v1 is one whole-matrix stream — no chunk parallelism
            if (transpose) corrupt("v1 has no transpose stream");
            v1::decode(buf, len, p_out, i_out, x_out);
            return 0;
        }
        Header h = read_header_v2(buf, len);
        verify_footer_crc(buf, len);
        StreamView v = resolve_stream(h, buf, len, transpose);

        std::vector<ChunkDesc> descs(v.num_chunks);
        std::vector<uint64_t> offs(v.num_chunks + 1, 0);
        for (uint32_t c = 0; c < v.num_chunks; ++c) {
            descs[c] = load_desc(buf, len, v, c);
            if (descs[c].nnz > h.nnz - offs[c])
                corrupt("chunk nnz exceeds header nnz");
            offs[c + 1] = offs[c] + descs[c].nnz;
        }
        if (offs[v.num_chunks] != h.nnz)
            corrupt("total chunk nnz disagrees with header");

        const uint8_t* base = buf + v.data_off;
        int nt = n_threads > 0
            ? n_threads
            : static_cast<int>(std::thread::hardware_concurrency());
        nt = std::max(1, std::min<int>(nt, static_cast<int>(
            v.num_chunks ? v.num_chunks : 1)));

        std::atomic<uint32_t> next{0};
        std::mutex err_mu;
        std::string err;
        auto worker = [&]() {
            std::vector<uint32_t> col_counts, rows;
            for (;;) {
                uint32_t c = next.fetch_add(1);
                if (c >= v.num_chunks) return;
                try {
                    const ChunkDesc& d = descs[c];
                    const uint64_t off = offs[c];
                    decode_gaps(base + d.stream_offset[0],
                                d.stream_size[0], d, v.nrows,
                                col_counts, rows);
                    uint64_t run = off;
                    for (uint32_t j = 0; j < d.num_cols; ++j) {
                        p_out[d.col_start + j] =
                            static_cast<int64_t>(run);
                        run += col_counts[j];
                    }
                    std::memcpy(i_out + off, rows.data(),
                                d.nnz * sizeof(int32_t));
                    decode_values(base + d.stream_offset[1],
                                  d.stream_size[1], d, h.value_type,
                                  x_out + off);
                } catch (const std::exception& e) {
                    std::lock_guard<std::mutex> g(err_mu);
                    if (err.empty()) err = e.what();
                    return;
                }
            }
        };
        if (nt <= 1) {
            worker();
        } else {
            std::vector<std::thread> pool;
            pool.reserve(nt);
            for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
            for (auto& th : pool) th.join();
        }
        if (!err.empty()) {
            g_error = err;
            return -1;
        }
        p_out[v.ncols] = static_cast<int64_t>(h.nnz);
        return 0;
    } catch (const std::exception& e) {
        g_error = e.what();
        return -1;
    }
}

// Encode CSC (p int64 (n+1), i int32, x float32) into a v2 buffer.
// value_type: 0/1/2 integer widths, 3 f32, 4 f16, 6 f64 input semantics
// (values cast from the f32 input).  with_transpose also encodes A^T for
// streaming W-updates.  Returns the number of bytes written, or -1; call
// with out=nullptr to query the required size (two-pass).
int64_t spz_encode(uint32_t m, uint32_t n, const int64_t* p, const int32_t* i,
                   const float* x, uint8_t value_type, uint32_t chunk_cols,
                   int with_transpose, uint8_t* out, uint64_t out_cap) {
    try {
        if (chunk_cols == 0) chunk_cols = 2048;
        uint64_t nnz = static_cast<uint64_t>(p[n]);

        auto encode_side = [&](uint32_t ncols, uint32_t nrows,
                               const int64_t* sp, const int32_t* si,
                               const float* sx,
                               std::vector<ChunkDesc>& descs,
                               std::vector<uint8_t>& data) {
            uint32_t nchunks = (ncols + chunk_cols - 1) / chunk_cols;
            if (ncols == 0) nchunks = 0;
            descs.resize(nchunks);
            // chunks are independent: encode payloads in a work-stealing
            // pool (same pattern as spz_decode_mt), then one serial pass
            // concatenates streams and assigns offsets
            std::vector<std::vector<uint8_t>> gap_bufs(nchunks);
            std::vector<std::vector<uint8_t>> val_bufs(nchunks);
            auto encode_chunk = [&](uint32_t c) {
                ChunkDesc& d = descs[c];
                d.col_start = c * chunk_cols;
                d.num_cols = std::min(chunk_cols, ncols - d.col_start);
                uint64_t lo = static_cast<uint64_t>(sp[d.col_start]);
                uint64_t hi = static_cast<uint64_t>(sp[d.col_start + d.num_cols]);
                d.nnz = static_cast<uint32_t>(hi - lo);

                // gaps
                std::vector<uint8_t>& gap_stream = gap_bufs[c];
                {
                    std::vector<uint8_t> cc;
                    for (uint32_t j = 0; j < d.num_cols; ++j)
                        varint_put(static_cast<uint64_t>(
                            sp[d.col_start + j + 1] - sp[d.col_start + j]), cc);
                    std::vector<uint32_t> gaps(d.nnz);
                    uint32_t gi = 0;
                    for (uint32_t j = 0; j < d.num_cols; ++j) {
                        uint32_t prev = 0;
                        for (int64_t k = sp[d.col_start + j];
                             k < sp[d.col_start + j + 1]; ++k) {
                            uint32_t row = static_cast<uint32_t>(si[k]);
                            // gap coding requires strictly increasing
                            // rows per column; a duplicate/unsorted row
                            // would wrap the u32 gap and encode a
                            // CRC-valid file that misdecodes (round-4
                            // review) — refuse loudly instead
                            if (row < prev || row >= nrows)
                                throw std::runtime_error(
                                    "unsorted, duplicate, or out-of-range "
                                    "row indices in CSC input (call "
                                    "sum_duplicates/sort_indices first)");
                            gaps[gi++] = row - prev;
                            prev = row + 1;
                        }
                    }
                    put_u32(static_cast<uint32_t>(cc.size()), gap_stream);
                    gap_stream.insert(gap_stream.end(), cc.begin(), cc.end());
                    if (d.nnz) {
                        auto enc = encode_rans_escape(gaps.data(), d.nnz);
                        gap_stream.insert(gap_stream.end(), enc.begin(), enc.end());
                    }
                }

                // values
                std::vector<uint8_t>& val_stream = val_bufs[c];
                if (d.nnz) {
                    const float* vals = sx + lo;
                    switch (value_type) {
                        case VT_U8: case VT_U16: case VT_U32: {
                            std::vector<uint32_t> iv(d.nnz);
                            // round in double: v + 0.5f at |v| >= 2^23
                            // rounds a full fp32 ulp upward (off-by-one)
                            for (uint32_t k = 0; k < d.nnz; ++k)
                                iv[k] = static_cast<uint32_t>(
                                    static_cast<double>(vals[k]) + 0.5);
                            val_stream = encode_rans_escape(iv.data(), d.nnz);
                            break;
                        }
                        case VT_F32: {
                            val_stream = encode_byteshuffle(
                                reinterpret_cast<const uint8_t*>(vals), d.nnz, 4);
                            break;
                        }
                        case VT_F16: {
                            std::vector<uint16_t> hv(d.nnz);
                            for (uint32_t k = 0; k < d.nnz; ++k)
                                hv[k] = float_to_half(vals[k]);
                            val_stream = encode_byteshuffle(
                                reinterpret_cast<const uint8_t*>(hv.data()),
                                d.nnz, 2);
                            break;
                        }
                        case VT_F64: {
                            std::vector<double> dv(vals, vals + d.nnz);
                            val_stream = encode_byteshuffle(
                                reinterpret_cast<const uint8_t*>(dv.data()),
                                d.nnz, 8);
                            break;
                        }
                        case VT_Q8: {
                            // per-chunk affine quantization to [0,255]
                            // (header_v2.hpp:53,234; quant params live in
                            // the chunk descriptor)
                            float vmin = vals[0], vmax = vals[0];
                            for (uint32_t k = 1; k < d.nnz; ++k) {
                                vmin = std::min(vmin, vals[k]);
                                vmax = std::max(vmax, vals[k]);
                            }
                            d.quant_offset = vmin;
                            d.quant_scale =
                                (vmax > vmin) ? (vmax - vmin) / 255.0f : 1.0f;
                            std::vector<uint32_t> q(d.nnz);
                            for (uint32_t k = 0; k < d.nnz; ++k) {
                                float qv = (vals[k] - d.quant_offset) /
                                           d.quant_scale;
                                q[k] = static_cast<uint32_t>(std::min(
                                    255.0f, std::max(0.0f, qv + 0.5f)));
                            }
                            val_stream = encode_rans_quant8(q.data(), d.nnz);
                            break;
                        }
                        default:
                            throw std::runtime_error("unsupported value type for encode");
                    }
                }

                // decoded allocation hints, as the reference writer fills
                // them (sparsepress_v2.hpp:610-611)
                d.decoded_gap_bytes = d.nnz * 4;
                d.decoded_value_bytes =
                    d.nnz * static_cast<uint32_t>(vt_size(value_type));
            };

            int nt = static_cast<int>(std::thread::hardware_concurrency());
            nt = std::max(1, std::min<int>(std::min(nt, 16),
                                           static_cast<int>(nchunks ? nchunks
                                                                    : 1)));
            if (nt <= 1 || nchunks <= 1) {
                for (uint32_t c = 0; c < nchunks; ++c) encode_chunk(c);
            } else {
                std::atomic<uint32_t> next{0};
                std::mutex err_mu;
                std::string err;
                auto worker = [&]() {
                    for (;;) {
                        uint32_t c = next.fetch_add(1);
                        if (c >= nchunks) return;
                        try {
                            encode_chunk(c);
                        } catch (const std::exception& e) {
                            std::lock_guard<std::mutex> g(err_mu);
                            if (err.empty()) err = e.what();
                            return;
                        }
                    }
                };
                std::vector<std::thread> pool;
                for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
                for (auto& th : pool) th.join();
                if (!err.empty()) throw std::runtime_error(err);
            }

            // serial assembly: offsets are prefix sums of the buffers
            uint64_t total_bytes = 0;
            for (uint32_t c = 0; c < nchunks; ++c)
                total_bytes += gap_bufs[c].size() + val_bufs[c].size();
            // the v2 format stores per-chunk stream offsets as u32
            // (header_v2.hpp ChunkDesc) — a >4 GiB payload side would
            // silently wrap the casts below and corrupt the file
            if (data.size() + total_bytes > 0xFFFFFFFFull)
                throw std::runtime_error(
                    "compressed payload exceeds the SparsePress v2 4 GiB "
                    "per-side limit (u32 chunk offsets); write the matrix "
                    "in column slices (st_slice_cols) or use v3");
            data.reserve(data.size() + total_bytes);
            for (uint32_t c = 0; c < nchunks; ++c) {
                ChunkDesc& d = descs[c];
                d.stream_offset[0] = static_cast<uint32_t>(data.size());
                d.stream_size[0] = static_cast<uint32_t>(gap_bufs[c].size());
                data.insert(data.end(), gap_bufs[c].begin(),
                            gap_bufs[c].end());
                d.stream_offset[1] = static_cast<uint32_t>(data.size());
                d.stream_size[1] = static_cast<uint32_t>(val_bufs[c].size());
                data.insert(data.end(), val_bufs[c].begin(),
                            val_bufs[c].end());
            }
        };

        std::vector<ChunkDesc> descs;
        std::vector<uint8_t> data;
        encode_side(n, m, p, i, x, descs, data);

        // optional transpose stream (CSC of A^T built here)
        std::vector<ChunkDesc> t_descs;
        std::vector<uint8_t> t_data;
        if (with_transpose) {
            std::vector<int64_t> tp(m + 1, 0);
            std::vector<int32_t> ti(nnz);
            std::vector<float> tx(nnz);
            for (uint64_t k = 0; k < nnz; ++k) ++tp[i[k] + 1];
            for (uint32_t r = 0; r < m; ++r) tp[r + 1] += tp[r];
            std::vector<int64_t> cursor(tp.begin(), tp.end() - 1);
            for (uint32_t j = 0; j < n; ++j)
                for (int64_t k = p[j]; k < p[j + 1]; ++k) {
                    int64_t dst = cursor[i[k]]++;
                    ti[dst] = static_cast<int32_t>(j);
                    tx[dst] = x[k];
                }
            encode_side(m, n, tp.data(), ti.data(), tx.data(), t_descs, t_data);
        }

        Header h;
        std::memset(&h, 0, sizeof(h));
        std::memcpy(h.magic, "SPRZ", 4);
        h.version = 2;
        h.header_size = 128;
        h.m = m; h.n = n; h.nnz = nnz;
        h.chunk_cols = chunk_cols;
        h.num_chunks = static_cast<uint32_t>(descs.size());
        h.table_log = kProbBits;
        h.value_type = value_type;
        h.compression_level = 1;   // DEFAULT (sparsepress_v2.hpp:633)
        h.density = (m && n)
            ? static_cast<float>(static_cast<double>(nnz) / (static_cast<double>(m) * n))
            : 0.0f;
        h.chunk_index_offset = sizeof(Header);
        // tables are embedded per chunk, so the table section is empty:
        // tables_offset == data_offset, num_tables == 0 — the layout the
        // reference writer emits (sparsepress_v2.hpp:630,643-644)
        h.tables_offset = h.chunk_index_offset + descs.size() * sizeof(ChunkDesc);
        h.data_offset = h.tables_offset;
        uint64_t pos = h.data_offset + data.size();
        if (with_transpose) {
            h.transpose_offset = pos;
            pos += 4 + t_descs.size() * sizeof(ChunkDesc) + t_data.size();
        }
        // footer
        uint64_t total = pos + 16;

        if (!out) return static_cast<int64_t>(total);
        if (out_cap < total) throw std::runtime_error("output buffer too small");

        uint8_t* w = out;
        std::memcpy(w, &h, sizeof(h)); w += sizeof(h);
        std::memcpy(w, descs.data(), descs.size() * sizeof(ChunkDesc));
        w += descs.size() * sizeof(ChunkDesc);
        std::memcpy(w, data.data(), data.size()); w += data.size();
        if (with_transpose) {
            uint32_t tc = static_cast<uint32_t>(t_descs.size());
            std::memcpy(w, &tc, 4); w += 4;
            std::memcpy(w, t_descs.data(), t_descs.size() * sizeof(ChunkDesc));
            w += t_descs.size() * sizeof(ChunkDesc);
            std::memcpy(w, t_data.data(), t_data.size()); w += t_data.size();
        }
        // footer: [metadata_size u32][crc u32][total_chunks u32]["SPEN"];
        // file_crc32 covers everything before the footer
        // (sparsepress_v2.hpp:858-863)
        uint32_t zero = 0;
        uint32_t crc = crc32_bytes(out, static_cast<size_t>(pos));
        std::memcpy(w, &zero, 4); w += 4;
        std::memcpy(w, &crc, 4); w += 4;
        std::memcpy(w, &h.num_chunks, 4); w += 4;
        std::memcpy(w, "SPEN", 4); w += 4;
        return static_cast<int64_t>(total);
    } catch (const std::exception& e) {
        g_error = e.what();
        return -1;
    }
}

// Decode a single chunk's columns (for the streaming loader): chunk index c
// of the forward (transpose=0) or transpose (=1) stream.  Caller sizes
// arrays from spz_chunk_info.
int spz_verify(const uint8_t* buf, uint64_t len) {
    try {
        if (peek_version(buf, len) == 1) return 0;  // v1: CRC inline at decode
        // v2 and v3 share the trailing footer layout; header parsing is
        // left to the decode paths
        verify_footer_crc(buf, len);
        return 0;
    } catch (const std::exception& e) {
        g_error = e.what();
        return -1;
    }
}

int spz_chunk_info(const uint8_t* buf, uint64_t len, int transpose,
                   uint32_t chunk_idx, uint32_t* col_start,
                   uint32_t* num_cols, uint32_t* nnz) {
    try {
        Header h = read_header_v2(buf, len);
        StreamView v = resolve_stream(h, buf, len, transpose);
        ChunkDesc d = load_desc(buf, len, v, chunk_idx);
        *col_start = d.col_start;
        *num_cols = d.num_cols;
        *nnz = d.nnz;
        return 0;
    } catch (const std::exception& e) {
        g_error = e.what();
        return -1;
    }
}

int spz_num_chunks(const uint8_t* buf, uint64_t len, int transpose,
                   uint32_t* out) {
    try {
        Header h = read_header_v2(buf, len);
        if (transpose && !h.transpose_offset) { *out = 0; return 0; }
        *out = resolve_stream(h, buf, len, transpose).num_chunks;
        return 0;
    } catch (const std::exception& e) {
        g_error = e.what();
        return -1;
    }
}

int spz_decode_chunk(const uint8_t* buf, uint64_t len, int transpose,
                     uint32_t chunk_idx, int64_t* p_out, int32_t* i_out,
                     float* x_out) {
    try {
        Header h = read_header_v2(buf, len);
        StreamView v = resolve_stream(h, buf, len, transpose);
        ChunkDesc d = load_desc(buf, len, v, chunk_idx);
        // the caller sized i_out/x_out from spz_chunk_info's d.nnz, which
        // load_desc re-reads from the same bytes — consistent by identity
        const uint8_t* base = buf + v.data_off;
        std::vector<uint32_t> col_counts, rows;
        decode_gaps(base + d.stream_offset[0], d.stream_size[0], d,
                    v.nrows, col_counts, rows);
        uint64_t off = 0;
        for (uint32_t j = 0; j < d.num_cols; ++j) {
            p_out[j] = static_cast<int64_t>(off);
            off += col_counts[j];
        }
        p_out[d.num_cols] = static_cast<int64_t>(off);
        std::memcpy(i_out, rows.data(), d.nnz * sizeof(int32_t));
        decode_values(base + d.stream_offset[1], d.stream_size[1], d,
                      h.value_type, x_out);
        return 0;
    } catch (const std::exception& e) {
        g_error = e.what();
        return -1;
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// SparsePress v3 — dense column-panel format (format/header_v3.hpp)
// ---------------------------------------------------------------------------

namespace {

#pragma pack(push, 1)
struct HeaderV3 {
    uint8_t magic[4];
    uint16_t version;
    uint16_t header_size;
    uint32_t m, n;
    uint64_t nnz;
    uint32_t chunk_cols;
    uint32_t num_chunks;
    uint32_t num_transpose_chunks;
    uint8_t value_type;
    uint8_t has_transpose;
    uint8_t reserved_flags[2];
    uint64_t chunk_index_offset;
    uint64_t data_offset;
    uint64_t transpose_index_offset;
    uint64_t transpose_data_offset;
    uint64_t metadata_offset;
    uint8_t reserved[48];     // [0]=codec (0 raw_fp32, 1 fp16), [1]=delta
};
struct DenseChunkDesc {
    uint32_t col_start;
    uint32_t num_cols;
    uint64_t byte_offset;
    uint64_t byte_size;
};
#pragma pack(pop)
static_assert(sizeof(HeaderV3) == 128, "v3 header must be 128 bytes");
static_assert(sizeof(DenseChunkDesc) == 24, "v3 chunk desc must be 24 bytes");

void v3_encode_panels(const float* data, uint32_t nrows, uint32_t ncols,
                      uint32_t chunk_cols, uint8_t codec,
                      std::vector<DenseChunkDesc>& descs,
                      std::vector<uint8_t>& out) {
    uint32_t nchunks = ncols ? (ncols + chunk_cols - 1) / chunk_cols : 0;
    descs.resize(nchunks);
    for (uint32_t c = 0; c < nchunks; ++c) {
        DenseChunkDesc& d = descs[c];
        d.col_start = c * chunk_cols;
        d.num_cols = std::min(chunk_cols, ncols - d.col_start);
        d.byte_offset = out.size();
        const float* panel = data + static_cast<uint64_t>(d.col_start) * nrows;
        uint64_t count = static_cast<uint64_t>(nrows) * d.num_cols;
        if (codec == 1) {       // fp16
            size_t base = out.size();
            out.resize(base + count * 2);
            uint16_t* w = reinterpret_cast<uint16_t*>(out.data() + base);
            for (uint64_t i = 0; i < count; ++i) w[i] = float_to_half(panel[i]);
        } else {                // raw fp32
            size_t base = out.size();
            out.resize(base + count * 4);
            std::memcpy(out.data() + base, panel, count * 4);
        }
        d.byte_size = out.size() - d.byte_offset;
    }
}

HeaderV3 read_header_v3(const uint8_t* buf, uint64_t len) {
    if (len < sizeof(HeaderV3)) corrupt("buffer smaller than v3 header");
    HeaderV3 h;
    std::memcpy(&h, buf, sizeof(h));
    if (std::memcmp(h.magic, "SPRZ", 4) != 0 || h.version != 3)
        corrupt("not a SparsePress v3 buffer");
    return h;
}

// validated view of a v3 panel stream
struct V3View {
    uint64_t desc_off, data_off;
    uint32_t num_chunks, ncols, nrows;
};

V3View resolve_v3(const HeaderV3& h, uint64_t len, int transpose) {
    V3View v;
    if (transpose) {
        if (!h.has_transpose) corrupt("no transpose stream");
        v.desc_off = h.transpose_index_offset;
        v.data_off = h.transpose_data_offset;
        v.num_chunks = h.num_transpose_chunks;
        v.ncols = h.m; v.nrows = h.n;
    } else {
        v.desc_off = h.chunk_index_offset;
        v.data_off = h.data_offset;
        v.num_chunks = h.num_chunks;
        v.ncols = h.n; v.nrows = h.m;
    }
    if (v.desc_off > len ||
        static_cast<uint64_t>(v.num_chunks) * sizeof(DenseChunkDesc) >
            len - v.desc_off)
        corrupt("v3 chunk index out of range");
    if (v.data_off > len) corrupt("v3 data offset out of range");
    return v;
}

DenseChunkDesc load_v3_desc(const uint8_t* buf, uint64_t len, const V3View& v,
                            uint8_t codec, uint32_t idx) {
    if (idx >= v.num_chunks) corrupt("chunk index out of range");
    DenseChunkDesc d;
    std::memcpy(&d, buf + v.desc_off + idx * sizeof(DenseChunkDesc),
                sizeof(d));
    uint64_t avail = len - v.data_off;
    if (d.byte_offset > avail || d.byte_size > avail - d.byte_offset)
        corrupt("v3 panel out of range");
    if (d.col_start > v.ncols || d.num_cols > v.ncols - d.col_start)
        corrupt("v3 panel columns out of range");
    uint64_t count = static_cast<uint64_t>(v.nrows) * d.num_cols;
    uint64_t width = (codec == 1) ? 2 : 4;
    if (count * width > d.byte_size) corrupt("v3 panel smaller than its shape");
    return d;
}

}  // namespace

extern "C" {

int spz_version(const uint8_t* buf, uint64_t len) {
    if (len < 8 || std::memcmp(buf, "SPRZ", 4) != 0) return -1;
    uint16_t ver;
    std::memcpy(&ver, buf + 4, 2);
    return ver;
}

int spz3_info(const uint8_t* buf, uint64_t len, uint32_t* m, uint32_t* n,
              uint8_t* has_transpose, uint8_t* codec) {
    try {
        if (len < sizeof(HeaderV3)) throw std::runtime_error("buffer too small");
        HeaderV3 h;
        std::memcpy(&h, buf, sizeof(h));
        if (std::memcmp(h.magic, "SPRZ", 4) != 0 || h.version != 3)
            throw std::runtime_error("not a SparsePress v3 buffer");
        *m = h.m; *n = h.n;
        *has_transpose = h.has_transpose;
        *codec = h.reserved[0];
        return 0;
    } catch (const std::exception& e) { g_error = e.what(); return -1; }
}

// Encode a dense column-major (m x n) fp32 matrix.  codec: 0 raw, 1 fp16.
// Two-pass size query like spz_encode (out=nullptr).
int64_t spz3_encode(uint32_t m, uint32_t n, const float* data, uint8_t codec,
                    uint32_t chunk_cols, int with_transpose, uint8_t* out,
                    uint64_t out_cap) {
    try {
        if (chunk_cols == 0) chunk_cols = 2048;
        std::vector<DenseChunkDesc> descs, t_descs;
        std::vector<uint8_t> panels, t_panels;
        v3_encode_panels(data, m, n, chunk_cols, codec, descs, panels);
        std::vector<float> At;
        if (with_transpose) {
            At.resize(static_cast<uint64_t>(m) * n);
            for (uint32_t j = 0; j < n; ++j)
                for (uint32_t i = 0; i < m; ++i)
                    At[static_cast<uint64_t>(i) * n + j] =
                        data[static_cast<uint64_t>(j) * m + i];
            v3_encode_panels(At.data(), n, m, chunk_cols, codec, t_descs,
                             t_panels);
        }

        HeaderV3 h;
        std::memset(&h, 0, sizeof(h));
        std::memcpy(h.magic, "SPRZ", 4);
        h.version = 3;
        h.header_size = 128;
        h.m = m; h.n = n;
        h.nnz = static_cast<uint64_t>(m) * n;
        h.chunk_cols = chunk_cols;
        h.num_chunks = static_cast<uint32_t>(descs.size());
        h.num_transpose_chunks = static_cast<uint32_t>(t_descs.size());
        h.value_type = 3;  // FLOAT32 logical type
        h.has_transpose = with_transpose ? 1 : 0;
        h.reserved[0] = codec;
        h.chunk_index_offset = sizeof(HeaderV3);
        h.data_offset = h.chunk_index_offset + descs.size() * sizeof(DenseChunkDesc);
        uint64_t pos = h.data_offset + panels.size();
        if (with_transpose) {
            h.transpose_index_offset = pos;
            pos += t_descs.size() * sizeof(DenseChunkDesc);
            h.transpose_data_offset = pos;
            pos += t_panels.size();
        }
        uint64_t total = pos + 16;   // footer
        if (!out) return static_cast<int64_t>(total);
        if (out_cap < total) throw std::runtime_error("output buffer too small");

        uint8_t* w = out;
        std::memcpy(w, &h, sizeof(h)); w += sizeof(h);
        std::memcpy(w, descs.data(), descs.size() * sizeof(DenseChunkDesc));
        w += descs.size() * sizeof(DenseChunkDesc);
        std::memcpy(w, panels.data(), panels.size()); w += panels.size();
        if (with_transpose) {
            std::memcpy(w, t_descs.data(), t_descs.size() * sizeof(DenseChunkDesc));
            w += t_descs.size() * sizeof(DenseChunkDesc);
            std::memcpy(w, t_panels.data(), t_panels.size()); w += t_panels.size();
        }
        // v3 footer mirrors v2: crc over everything before the footer
        // (sparsepress_v3.hpp:495-498)
        uint32_t zero = 0;
        uint32_t crc = crc32_bytes(out, static_cast<size_t>(pos));
        std::memcpy(w, &zero, 4); w += 4;
        std::memcpy(w, &crc, 4); w += 4;
        std::memcpy(w, &h.num_chunks, 4); w += 4;
        std::memcpy(w, "SPEN", 4); w += 4;
        return static_cast<int64_t>(total);
    } catch (const std::exception& e) { g_error = e.what(); return -1; }
}

// Decode full v3 matrix into caller-allocated column-major fp32 (m*n) —
// transpose=1 decodes the transpose stream (n*m).
int spz3_decode(const uint8_t* buf, uint64_t len, int transpose,
                float* out) {
    try {
        HeaderV3 h = read_header_v3(buf, len);
        V3View v = resolve_v3(h, len, transpose);
        uint8_t codec = h.reserved[0];
        for (uint32_t c = 0; c < v.num_chunks; ++c) {
            DenseChunkDesc d = load_v3_desc(buf, len, v, codec, c);
            const uint8_t* src = buf + v.data_off + d.byte_offset;
            float* dst = out + static_cast<uint64_t>(d.col_start) * v.nrows;
            uint64_t count = static_cast<uint64_t>(v.nrows) * d.num_cols;
            if (codec == 1) {
                const uint16_t* hsrc = reinterpret_cast<const uint16_t*>(src);
                for (uint64_t i = 0; i < count; ++i)
                    dst[i] = half_to_float(hsrc[i]);
            } else {
                std::memcpy(dst, src, count * 4);
            }
        }
        return 0;
    } catch (const std::exception& e) { g_error = e.what(); return -1; }
}

int spz3_decode_chunk(const uint8_t* buf, uint64_t len, int transpose,
                      uint32_t chunk_idx, uint32_t* col_start,
                      uint32_t* num_cols, float* out) {
    try {
        HeaderV3 h = read_header_v3(buf, len);
        V3View v = resolve_v3(h, len, transpose);
        DenseChunkDesc d = load_v3_desc(buf, len, v, h.reserved[0], chunk_idx);
        *col_start = d.col_start;
        *num_cols = d.num_cols;
        if (!out) return 0;
        uint64_t count = static_cast<uint64_t>(v.nrows) * d.num_cols;
        const uint8_t* src = buf + v.data_off + d.byte_offset;
        if (h.reserved[0] == 1) {
            const uint16_t* hsrc = reinterpret_cast<const uint16_t*>(src);
            for (uint64_t i = 0; i < count; ++i) out[i] = half_to_float(hsrc[i]);
        } else {
            std::memcpy(out, src, count * 4);
        }
        return 0;
    } catch (const std::exception& e) { g_error = e.what(); return -1; }
}

int spz3_num_chunks(const uint8_t* buf, uint64_t len, int transpose,
                    uint32_t* out) {
    try {
        HeaderV3 h = read_header_v3(buf, len);
        if (transpose && !h.has_transpose) { *out = 0; return 0; }
        *out = resolve_v3(h, len, transpose).num_chunks;
        return 0;
    } catch (const std::exception& e) { g_error = e.what(); return -1; }
}

}  // extern "C"
