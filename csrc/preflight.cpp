// Preflight (E3) record-generating interpreter, native implementation.
//
// Mirrors openvm_tpu/vm/preflight.py exactly (tested equal): executes the
// transpiled program with a word-granular timestamped memory and appends
// column-oriented records per executor chip into caller-provided int64
// matrices (row-major, fixed column layouts listed below — vm/native.py
// slices them back into the tracegen record dicts).
//
// The reference keeps this layer native too (Rust PreflightInterpretedInstance,
// crates/vm/src/arch/interpreter_preflight.rs).

#include <cstdint>
#include <cstring>
#include <vector>
#include <memory>

namespace {

constexpr uint64_t kP = 2013265921;
constexpr uint32_t kInitialTs = 1;

enum : int64_t {
  TERMINATE = 0,
  PHANTOM = 1,
  ADD = 0x200, SUB, XOR_, OR_, AND_,
  SLL = 0x205, SRL, SRA,
  SLT = 0x208, SLTU,
  LOADW = 0x210, LOADBU, LOADHU, STOREW, STOREH, STOREB, LOADB, LOADH,
  BEQ = 0x220, BNE,
  BLT = 0x225, BLTU, BGE, BGEU,
  JAL = 0x230, LUI,
  JALR = 0x235,
  AUIPC = 0x240,
  MUL = 0x250, MULH, MULHSU, MULHU,
  DIV = 0x254, DIVU, REM, REMU,
  HINT_STOREW = 0x260, HINT_BUFFER,
};

constexpr uint16_t kHintInput = 0x20;

// record column widths (must match vm/native.py PREFLIGHT_LAYOUTS)
enum Chip { ALU, LT, SHIFT, MULC, DIVREM, BEQC, BLTC, JALLUI, JALRC, AUIPCC,
            LS, HINT, PHANTOMC, NUM_CHIPS };
constexpr int kWidths[NUM_CHIPS] = {26, 22, 26, 25, 29, 17, 17, 16, 23, 13,
                                    31, 28, 5};

struct PreflightOut {
  int64_t error;        // 0 ok (see interpreter.cpp codes); 6 = capacity
  int64_t exit_code;
  uint64_t instret;
  uint32_t final_pc;
  uint64_t final_ts;
  int64_t n_touched;
};

inline int32_t sx32(uint32_t v) { return static_cast<int32_t>(v); }

struct Memory {
  // word-granular: value + last ts + initial value; touched tracked in
  // order.  Pages allocated on demand: a flat 2^27-word address space
  // zero-filled per call cost ~2s/preflight regardless of program size.
  static constexpr uint32_t PB = 16;
  static constexpr uint32_t PSZ = 1u << PB;
  static constexpr uint32_t PMASK = PSZ - 1;
  struct Page {
    uint32_t val[PSZ];
    uint32_t ts[PSZ];
    uint32_t init[PSZ];
    uint8_t touched[PSZ];
  };
  std::vector<std::unique_ptr<Page>> pages;
  std::vector<int64_t>* touch_order;
  int64_t base_key;  // (as << 27)

  void setup(size_t words, int64_t key, std::vector<int64_t>* order) {
    pages.clear();
    pages.resize((words + PSZ - 1) / PSZ);
    base_key = key;
    touch_order = order;
  }
  inline Page& pg(uint32_t wa) {
    auto& p = pages[wa >> PB];
    if (!p) p.reset(new Page());
    return *p;
  }
  inline void touch(Page& p, uint32_t wa, uint32_t off) {
    if (!p.touched[off]) {
      p.touched[off] = 1;
      p.init[off] = p.val[off];
      touch_order->push_back(base_key | wa);
    }
  }
  inline uint32_t read(uint32_t wa, uint32_t now, uint32_t* prev_ts) {
    Page& p = pg(wa);
    uint32_t off = wa & PMASK;
    touch(p, wa, off);
    *prev_ts = p.ts[off];
    p.ts[off] = now;
    return p.val[off];
  }
  inline uint32_t write(uint32_t wa, uint32_t v, uint32_t now,
                        uint32_t* prev_ts) {
    Page& p = pg(wa);
    uint32_t off = wa & PMASK;
    touch(p, wa, off);
    *prev_ts = p.ts[off];
    uint32_t prev = p.val[off];
    p.val[off] = v;
    p.ts[off] = now;
    return prev;
  }
  inline uint32_t peek_val(uint32_t wa) {
    Page& p = pg(wa);
    return p.val[wa & PMASK];
  }
  inline uint32_t peek_init(uint32_t wa) {
    Page& p = pg(wa);
    return p.init[wa & PMASK];
  }
  inline uint32_t peek_ts(uint32_t wa) {
    Page& p = pg(wa);
    return p.ts[wa & PMASK];
  }
  inline void poke_val(uint32_t wa, uint32_t v) {
    pg(wa).val[wa & PMASK] = v;
  }
};

struct Rec {
  int64_t* buf;
  int64_t cap, n, width;
  bool count_only;
  int64_t scratch[64];
  inline int64_t* row() {
    if (count_only) { n++; return scratch; }
    if (n >= cap) return nullptr;
    return buf + (n++) * width;
  }
};

inline void put_limbs(int64_t* p, uint32_t v) {
  p[0] = v & 0xFF; p[1] = (v >> 8) & 0xFF;
  p[2] = (v >> 16) & 0xFF; p[3] = (v >> 24) & 0xFF;
}

}  // namespace

extern "C" {

PreflightOut preflight(
    const int64_t* opcode, const int64_t* oa, const int64_t* ob,
    const int64_t* oc, const int64_t* od, const int64_t* oe,
    const int64_t* of_, const int64_t* og, int64_t n_insns, uint32_t pc_base,
    uint32_t pc_start,
    // initial AS2 memory image as word array (word_addr -> value), with a
    // list of imaged word addresses
    const int64_t* image_words, const int64_t* image_vals, int64_t n_image,
    // inputs
    const uint8_t* inputs, const int64_t* input_lens, int64_t n_inputs,
    // per-chip record buffers (row-major int64, widths kWidths)
    int64_t** rec_bufs, const int64_t* rec_caps, int64_t* rec_counts,
    // outputs
    int64_t* exec_counts,        // per instruction index
    int64_t* touched_out,        // capacity x 11: as, wa, i0..3, f0..3, ts
    int64_t touched_cap,
    uint64_t max_insns, int64_t count_only) {
  PreflightOut res{0, -1, 0, pc_start, 0, 0};

  std::vector<int64_t> touch_order;
  Memory regs, mem, pvs;
  regs.setup(32, 1ll << 27, &touch_order);
  mem.setup(1ull << 27, 2ll << 27, &touch_order);
  pvs.setup(64, 3ll << 27, &touch_order);
  for (int64_t i = 0; i < n_image; i++) {
    mem.poke_val(static_cast<uint32_t>(image_words[i]),
                 static_cast<uint32_t>(image_vals[i]));
  }

  Rec recs[NUM_CHIPS];
  for (int i = 0; i < NUM_CHIPS; i++) {
    recs[i].buf = rec_bufs ? rec_bufs[i] : nullptr;
    recs[i].cap = rec_caps ? rec_caps[i] : 0;
    recs[i].n = 0;
    recs[i].width = kWidths[i];
    recs[i].count_only = (count_only != 0);
  }

  std::vector<uint8_t> hint;
  size_t hint_pos = 0;
  int64_t next_input = 0;
  const uint8_t* input_ptr = inputs;

  uint32_t pc = pc_start;
  uint64_t ts = kInitialTs;
  uint64_t instret = 0;

#define ROW(chip, r)                        \
  int64_t* r = recs[chip].row();            \
  if (!r) { res.error = 6; goto done; }

  for (;;) {
    if (max_insns && instret >= max_insns) { res.error = 5; break; }
    int64_t idx = (static_cast<int64_t>(pc) - pc_base) / 4;
    if (idx < 0 || idx >= n_insns) { res.error = 1; break; }
    const int64_t op = opcode[idx];
    if (op == TERMINATE) {
      res.exit_code = oc[idx];
      break;
    }
    exec_counts[idx]++;
    instret++;
    const uint32_t a = static_cast<uint32_t>(oa[idx]);
    const uint32_t b = static_cast<uint32_t>(ob[idx]);
    const uint32_t c = static_cast<uint32_t>(oc[idx]);
    const uint32_t e = static_cast<uint32_t>(oe[idx]);
    const uint32_t f = static_cast<uint32_t>(of_[idx]);
    const uint32_t g = static_cast<uint32_t>(og[idx]);

    if ((op >= ADD && op <= AND_) || op == SLT || op == SLTU
        || (op >= SLL && op <= SRA)) {
      const bool is_shift = (op >= SLL && op <= SRA);
      const bool is_lt = (op == SLT || op == SLTU);
      const Chip chip = is_shift ? SHIFT : (is_lt ? LT : ALU);
      const int is_imm = (e == 0);
      uint32_t p1, p2 = 0;
      uint32_t x = regs.read(b / 4, ts, &p1);
      uint32_t y;
      if (is_imm) {
        if (is_shift) {
          y = c & 31;
        } else {
          uint32_t imm = c & 0xFFFFFF;
          y = (imm & 0x800000) ? (imm | 0xFF000000) : imm;
        }
      } else {
        y = regs.read(c / 4, ts + 1, &p2);
      }
      uint32_t v;
      int64_t oi;
      if (is_shift) {
        uint32_t sh = y & 31;
        oi = op - SLL;
        v = op == SLL ? (x << sh)
          : op == SRL ? (x >> sh)
          : static_cast<uint32_t>(sx32(x) >> sh);
      } else if (is_lt) {
        oi = op - SLT;
        v = op == SLT ? (sx32(x) < sx32(y)) : (x < y);
      } else {
        oi = op - ADD;
        switch (op) {
          case ADD: v = x + y; break;
          case SUB: v = x - y; break;
          case XOR_: v = x ^ y; break;
          case OR_: v = x | y; break;
          default: v = x & y; break;
        }
      }
      uint32_t pw;
      uint32_t prev = regs.write(a / 4, v, ts + 2, &pw);
      ROW(chip, r);
      r[0] = pc; r[1] = ts; r[2] = oi; r[3] = is_imm;
      r[4] = a / 4; r[5] = b / 4; r[6] = is_imm ? c : c / 4;
      put_limbs(r + 7, x);
      put_limbs(r + 11, y);
      if (chip == LT) {
        r[15] = p1; r[16] = is_imm ? 0 : p2; r[17] = pw;
        put_limbs(r + 18, prev);
      } else {
        put_limbs(r + 15, v);
        r[19] = p1; r[20] = is_imm ? 0 : p2; r[21] = pw;
        put_limbs(r + 22, prev);
      }
      pc += 4; ts += 3;

    } else if ((op == MUL) || (op >= MULH && op <= MULHU)
               || (op >= DIV && op <= REMU)) {
      uint32_t p1, p2, pw;
      uint32_t x = regs.read(b / 4, ts, &p1);
      uint32_t y = regs.read(c / 4, ts + 1, &p2);
      if (op >= DIV && op <= REMU) {
        int64_t oi = op - DIV;
        bool is_signed = (oi == 0 || oi == 2);
        uint32_t q, rr;
        if (y == 0) {
          q = 0xFFFFFFFFu; rr = x;
        } else if (is_signed && x == 0x80000000u && y == 0xFFFFFFFFu) {
          q = 0x80000000u; rr = 0;
        } else if (is_signed) {
          int32_t xs = sx32(x), ys = sx32(y);
          int32_t qs = xs / ys;  // C++ truncates toward zero = RISC-V
          q = static_cast<uint32_t>(qs);
          rr = static_cast<uint32_t>(xs % ys);
        } else {
          q = x / y; rr = x % y;
        }
        uint32_t v = (oi == 0 || oi == 1) ? q : rr;
        uint32_t prev = regs.write(a / 4, v, ts + 2, &pw);
        ROW(DIVREM, r);
        r[0] = pc; r[1] = ts; r[2] = oi; r[3] = a / 4; r[4] = b / 4;
        r[5] = c / 4;
        put_limbs(r + 6, x); put_limbs(r + 10, y);
        put_limbs(r + 14, q); put_limbs(r + 18, rr);
        r[22] = p1; r[23] = p2; r[24] = pw;
        put_limbs(r + 25, prev);
      } else {
        int64_t oi;
        uint32_t v;
        if (op == MUL) { oi = 0; v = x * y; }
        else {
          oi = op - MULH + 1;
          int64_t xs = sx32(x), ys = sx32(y);
          uint64_t prod = op == MULH ? static_cast<uint64_t>(xs * ys)
                        : op == MULHSU ? static_cast<uint64_t>(
                              xs * static_cast<int64_t>(y))
                        : static_cast<uint64_t>(x) * y;
          v = static_cast<uint32_t>(prod >> 32);
        }
        uint32_t prev = regs.write(a / 4, v, ts + 2, &pw);
        ROW(MULC, r);
        r[0] = pc; r[1] = ts; r[2] = oi; r[3] = a / 4; r[4] = b / 4;
        r[5] = c / 4;
        put_limbs(r + 6, x); put_limbs(r + 10, y); put_limbs(r + 14, v);
        r[18] = p1; r[19] = p2; r[20] = pw;
        put_limbs(r + 21, prev);
      }
      pc += 4; ts += 3;

    } else if (op == BEQ || op == BNE || (op >= BLT && op <= BGEU)) {
      const bool is_eq = (op == BEQ || op == BNE);
      uint32_t p1, p2;
      uint32_t x = regs.read(a / 4, ts, &p1);
      uint32_t y = regs.read(b / 4, ts + 1, &p2);
      bool taken;
      int64_t oi;
      if (is_eq) {
        oi = op - BEQ;
        taken = (op == BEQ) == (x == y);
      } else {
        oi = op - BLT;
        bool lt = (oi == 0 || oi == 2) ? (sx32(x) < sx32(y)) : (x < y);
        taken = (oi <= 1) ? lt : !lt;
      }
      int32_t off = c > kP / 2 ? static_cast<int32_t>(c - kP) : c;
      uint32_t to_pc = taken ? pc + off : pc + 4;
      ROW(is_eq ? BEQC : BLTC, r);
      r[0] = pc; r[1] = ts; r[2] = oi; r[3] = a / 4; r[4] = b / 4; r[5] = c;
      put_limbs(r + 6, x); put_limbs(r + 10, y);
      r[14] = to_pc; r[15] = p1; r[16] = p2;
      pc = to_pc; ts += 2;

    } else if (op == JAL || op == LUI) {
      const bool is_jal = (op == JAL);
      const int nw = (f != 0);
      uint32_t rd_val, to_pc;
      if (is_jal) {
        rd_val = pc + 4;
        int32_t off = c > kP / 2 ? static_cast<int32_t>(c - kP) : c;
        to_pc = pc + off;
      } else {
        rd_val = c << 12;
        to_pc = pc + 4;
      }
      uint32_t pw = 0, prev = 0;
      if (nw) prev = regs.write(a / 4, rd_val, ts, &pw);
      ROW(JALLUI, r);
      r[0] = pc; r[1] = ts; r[2] = is_jal ? 0 : 1; r[3] = a / 4; r[4] = c;
      r[5] = nw;
      put_limbs(r + 6, nw ? rd_val : 0);
      r[10] = to_pc; r[11] = pw;
      put_limbs(r + 12, prev);
      pc = to_pc; ts += 1;

    } else if (op == JALR) {
      const int nw = (f != 0);
      uint32_t p1;
      uint32_t x = regs.read(b / 4, ts, &p1);
      uint32_t imm = (c & 0xFFFF) | (g ? 0xFFFF0000u : 0);
      uint32_t target = x + imm;
      uint32_t lsb = target & 1;
      uint32_t to_pc = target & ~1u;
      uint32_t rd_val = pc + 4;
      uint32_t pw = 0, prev = 0;
      if (nw) prev = regs.write(a / 4, rd_val, ts + 1, &pw);
      ROW(JALRC, r);
      r[0] = pc; r[1] = ts; r[2] = a / 4; r[3] = b / 4; r[4] = c; r[5] = g;
      r[6] = nw;
      put_limbs(r + 7, x);
      put_limbs(r + 11, nw ? rd_val : 0);
      r[15] = to_pc; r[16] = lsb; r[17] = p1; r[18] = pw;
      put_limbs(r + 19, prev);
      pc = to_pc; ts += 2;

    } else if (op == AUIPC) {
      uint32_t rd_val = pc + (c << 8);
      uint32_t pw;
      uint32_t prev = regs.write(a / 4, rd_val, ts, &pw);
      ROW(AUIPCC, r);
      r[0] = pc; r[1] = ts; r[2] = a / 4; r[3] = c;
      put_limbs(r + 4, rd_val);
      r[8] = pw;
      put_limbs(r + 9, prev);
      pc += 4; ts += 1;

    } else if (op >= LOADW && op <= LOADH) {
      const int64_t oi = op - LOADW;
      const bool is_load = (oi < 3 || oi > 5);
      const int nw = (f != 0);
      uint32_t p1, p2, pw = 0;
      uint32_t x = regs.read(b / 4, ts, &p1);
      uint32_t imm = (c & 0xFFFF) | (g ? 0xFFFF0000u : 0);
      uint32_t full = x + imm;
      uint32_t wa = full >> 2, shift = full & 3;
      uint32_t data2, new3, prev = 0;
      if (is_load) {
        if (e != 2 || wa >= (1u << 27)) { res.error = 1; break; }
        data2 = mem.read(wa, ts + 1, &p2);
        const uint8_t* db = reinterpret_cast<const uint8_t*>(&data2);
        switch (op) {
          case LOADW: new3 = data2; break;
          case LOADBU: new3 = db[shift]; break;
          case LOADHU: new3 = db[shift] | (db[shift + 1] << 8); break;
          case LOADB: new3 = static_cast<uint32_t>(
                          static_cast<int8_t>(db[shift])); break;
          default: new3 = static_cast<uint32_t>(static_cast<int16_t>(
                       db[shift] | (db[shift + 1] << 8))); break;
        }
        if (nw) prev = regs.write(a / 4, new3, ts + 2, &pw);
      } else {
        data2 = regs.read(a / 4, ts + 1, &p2);
        Memory* m = nullptr;
        if (e == 2) m = &mem;
        else if (e == 3) m = &pvs;
        else { res.error = 1; break; }
        if ((e == 2 && wa >= (1u << 27)) || (e == 3 && wa >= 8)) {
          res.error = 1; break;
        }
        uint32_t cur = m->peek_val(wa);
        uint8_t nb[4];
        std::memcpy(nb, &cur, 4);
        const uint8_t* vb = reinterpret_cast<const uint8_t*>(&data2);
        if (op == STOREW) { std::memcpy(nb, vb, 4); }
        else if (op == STOREH) { nb[shift] = vb[0]; nb[shift + 1] = vb[1]; }
        else { nb[shift] = vb[0]; }
        std::memcpy(&new3, nb, 4);
        prev = m->write(wa, new3, ts + 2, &pw);
      }
      ROW(LS, r);
      r[0] = pc; r[1] = ts; r[2] = oi; r[3] = a / 4; r[4] = b / 4; r[5] = c;
      r[6] = g; r[7] = e; r[8] = nw;
      put_limbs(r + 9, x);
      r[13] = wa; r[14] = shift & 1; r[15] = shift >> 1;
      put_limbs(r + 16, data2);
      put_limbs(r + 20, new3);
      r[24] = p1; r[25] = p2; r[26] = is_load && !nw ? 0 : pw;
      put_limbs(r + 27, is_load && !nw ? 0 : prev);
      pc += 4; ts += 3;

    } else if (op == HINT_STOREW || op == HINT_BUFFER) {
      const int is_buf = (op == HINT_BUFFER);
      uint32_t p1, p2 = 0;
      uint32_t ptr_v = regs.read(b / 4, ts, &p1);
      uint32_t len_v = 0;
      if (is_buf) len_v = regs.read(a / 4, ts + 1, &p2);
      uint32_t num_words = is_buf ? len_v : 1;
      if (ptr_v % 4 != 0 || num_words == 0) { res.error = 1; break; }
      if (hint.size() - hint_pos < 4ull * num_words) { res.error = 3; break; }
      for (uint32_t k = 0; k < num_words; k++) {
        uint32_t wa = ptr_v / 4 + k;
        if (wa >= (1u << 27)) { res.error = 1; break; }
        uint32_t data;
        std::memcpy(&data, hint.data() + hint_pos + 4 * k, 4);
        uint32_t pw;
        uint32_t prev = mem.write(wa, data, ts + 2 + k, &pw);
        ROW(HINT, r);
        r[0] = pc; r[1] = ts; r[2] = (k == 0); r[3] = is_buf;
        r[4] = a / 4; r[5] = b / 4; r[6] = num_words - k; r[7] = wa;
        r[8] = ts + 2 + k;
        put_limbs(r + 9, ptr_v);
        put_limbs(r + 13, is_buf ? len_v : 0);
        put_limbs(r + 17, data);
        r[21] = p1; r[22] = is_buf ? p2 : 0; r[23] = pw;
        put_limbs(r + 24, prev);
      }
      if (res.error) break;
      hint_pos += 4ull * num_words;
      pc += 4; ts += 2 + num_words;

    } else if (op == PHANTOM) {
      uint16_t disc = c & 0xFFFF;
      if (disc == kHintInput) {
        if (next_input >= n_inputs) { res.error = 4; break; }
        int64_t len = input_lens[next_input];
        hint.clear();
        hint_pos = 0;
        uint32_t l32 = static_cast<uint32_t>(len);
        hint.insert(hint.end(), reinterpret_cast<uint8_t*>(&l32),
                    reinterpret_cast<uint8_t*>(&l32) + 4);
        hint.insert(hint.end(), input_ptr, input_ptr + len);
        while (hint.size() % 4) hint.push_back(0);
        input_ptr += len;
        next_input++;
      }
      ROW(PHANTOMC, r);
      r[0] = pc; r[1] = ts; r[2] = a; r[3] = b; r[4] = c;
      pc += 4; ts += 1;

    } else {
      res.error = 2;
      break;
    }
  }
done:

  for (int i = 0; i < NUM_CHIPS; i++) rec_counts[i] = recs[i].n;
  // touched output (insertion order; python sorts)
  int64_t nt = 0;
  if (count_only) {
    res.n_touched = static_cast<int64_t>(touch_order.size());
    res.instret = instret;
    res.final_pc = pc;
    res.final_ts = ts;
    return res;
  }
  for (int64_t key : touch_order) {
    if (nt >= touched_cap) { res.error = 6; break; }
    int64_t a_s = key >> 27;
    uint32_t wa = key & ((1 << 27) - 1);
    Memory* m = a_s == 1 ? &regs : (a_s == 2 ? &mem : &pvs);
    int64_t* row = touched_out + nt * 11;
    row[0] = a_s;
    row[1] = wa;
    put_limbs(row + 2, m->peek_init(wa));
    put_limbs(row + 6, m->peek_val(wa));
    row[10] = m->peek_ts(wa);
    nt++;
  }
  res.n_touched = nt;
  res.instret = instret;
  res.final_pc = pc;
  res.final_ts = ts;
  return res;
}

}  // extern "C"
