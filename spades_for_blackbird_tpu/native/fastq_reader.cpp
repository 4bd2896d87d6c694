// Native FASTA/FASTQ(.gz) -> 2-bit-code tensor ingest.
//
// TPU-native framework's counterpart of the reference's C++ read streams
// (assembler/src/common/io/reads/fasta_fastq_gz_parser.hpp kseq parser +
// binary read store, io/reads/binary_converter.hpp:25). The hot loop
// parses gzipped FASTQ and packs bases straight into the padded uint8
// code tensor the device consumes (A=0 C=1 G=2 T=3, 4 = N/padding) —
// no intermediate strings, one malloc-free fill pass.
//
// Exposed as a C ABI for ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -shared -fPIC fastq_reader.cpp -lz -o _native.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <zlib.h>

namespace {

constexpr uint8_t kInvalid = 4;

struct CodeTable {
    uint8_t t[256];
    CodeTable() {
        memset(t, kInvalid, sizeof(t));
        t['A'] = t['a'] = 0;
        t['C'] = t['c'] = 1;
        t['G'] = t['g'] = 2;
        t['T'] = t['t'] = 3;
    }
};
const CodeTable kCodes;

class LineReader {
  public:
    explicit LineReader(const char* path)
        : f_(gzopen(path, "rb")), len_(0), pos_(0), eof_(false) {}
    ~LineReader() {
        if (f_) gzclose(f_);
    }
    bool ok() const { return f_ != nullptr; }

    // Returns pointer to the next line (no terminator), length in *n.
    // Returns nullptr at EOF. The pointer is valid until the next call.
    const char* next_line(int64_t* n) {
        line_.clear();
        while (true) {
            if (pos_ >= len_) {
                if (eof_) break;
                len_ = gzread(f_, buf_, sizeof(buf_));
                pos_ = 0;
                if (len_ <= 0) {
                    eof_ = true;
                    len_ = 0;
                    break;
                }
            }
            char* nl = static_cast<char*>(
                memchr(buf_ + pos_, '\n', len_ - pos_));
            if (nl) {
                line_.append(buf_ + pos_, nl - (buf_ + pos_));
                pos_ = (nl - buf_) + 1;
                break;
            }
            line_.append(buf_ + pos_, len_ - pos_);
            pos_ = len_;
        }
        if (line_.empty() && eof_ && pos_ >= len_) return nullptr;
        if (!line_.empty() && line_.back() == '\r') line_.pop_back();
        *n = static_cast<int64_t>(line_.size());
        return line_.data();
    }

  private:
    gzFile f_;
    char buf_[1 << 16];
    int64_t len_, pos_;
    bool eof_;
    std::string line_;
};

}  // namespace

extern "C" {

// Pass 1: count records and max sequence length.
// Returns number of reads, or -1 on error. Sets *max_len.
int64_t fbtpu_scan(const char* path, int64_t* max_len) {
    LineReader r(path);
    if (!r.ok()) return -1;
    int64_t n = 0, maxlen = 0, cur = 0, llen;
    const char* line = r.next_line(&llen);
    if (!line) {
        *max_len = 0;
        return 0;
    }
    if (line[0] == '>') {  // FASTA
        cur = 0;
        while ((line = r.next_line(&llen)) != nullptr) {
            if (llen > 0 && line[0] == '>') {
                if (cur > maxlen) maxlen = cur;
                cur = 0;
                ++n;
            } else {
                cur += llen;
            }
        }
        if (cur > maxlen) maxlen = cur;
        ++n;
    } else if (line[0] == '@') {  // FASTQ: 4-line records
        while (true) {
            line = r.next_line(&llen);  // sequence
            if (!line) break;
            if (llen > maxlen) maxlen = llen;
            ++n;
            if (!r.next_line(&llen)) break;  // '+'
            if (!r.next_line(&llen)) break;  // quality
            if (!r.next_line(&llen)) break;  // next header
        }
    } else {
        return -1;
    }
    *max_len = maxlen;
    return n;
}

// Pass 2: fill codes (R*L uint8, caller-allocated) and lengths (R int32).
// codes must be pre-sized; rows are padded with 4. Optionally fills
// quals (R*L uint8 phred+33 raw, may be null). Returns reads filled.
int64_t fbtpu_fill(const char* path, uint8_t* codes, int32_t* lengths,
                   uint8_t* quals, int64_t R, int64_t L) {
    LineReader r(path);
    if (!r.ok()) return -1;
    memset(codes, kInvalid, static_cast<size_t>(R) * L);
    if (quals) memset(quals, 0, static_cast<size_t>(R) * L);
    int64_t llen;
    const char* line = r.next_line(&llen);
    if (!line) return 0;
    int64_t row = 0;
    if (line[0] == '>') {
        int64_t col = 0;
        while ((line = r.next_line(&llen)) != nullptr) {
            if (llen > 0 && line[0] == '>') {
                if (row < R) lengths[row] = static_cast<int32_t>(col);
                ++row;
                col = 0;
                continue;
            }
            if (row < R) {
                uint8_t* dst = codes + row * L + col;
                for (int64_t i = 0; i < llen && col + i < L; ++i)
                    dst[i] = kCodes.t[static_cast<uint8_t>(line[i])];
            }
            col += llen;
        }
        if (row < R) lengths[row] = static_cast<int32_t>(col);
        ++row;
    } else if (line[0] == '@') {
        while (row < R) {
            line = r.next_line(&llen);  // sequence
            if (!line) break;
            int64_t n = llen < L ? llen : L;
            uint8_t* dst = codes + row * L;
            for (int64_t i = 0; i < n; ++i)
                dst[i] = kCodes.t[static_cast<uint8_t>(line[i])];
            lengths[row] = static_cast<int32_t>(n);
            if (!r.next_line(&llen)) { ++row; break; }  // '+'
            line = r.next_line(&llen);                  // quality
            if (quals && line) {
                int64_t qn = llen < L ? llen : L;
                memcpy(quals + row * L, line, qn);
            }
            ++row;
            if (!line) break;
            if (!r.next_line(&llen)) break;             // next header
        }
    } else {
        return -1;
    }
    return row;
}

}  // extern "C"
