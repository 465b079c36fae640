// E1 pure interpreter, native implementation.
//
// The reference implements its interpreter hot loop in Rust with precomputed
// per-pc handlers (reference crates/vm/src/arch/interpreter.rs:80-131); this
// is the equivalent native path for the TPU framework: Python transpiles the
// program into flat operand arrays, this loop executes them at native speed.
// Exposed via a C ABI consumed with ctypes (vm/native.py).
//
// Semantics mirror vm/interpreter.py exactly (tested against it).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

constexpr uint64_t kP = 2013265921;

// opcode constants (vm/instructions.py)
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

struct ExecResult {
  int64_t exit_code;   // -1 = error
  uint64_t instret;
  uint32_t final_pc;
  int64_t error;       // 0 ok; 1 pc oob; 2 unsupported; 3 hint underflow;
                       // 4 input end; 5 insn limit
};

inline int32_t sx32(uint32_t v) { return static_cast<int32_t>(v); }

}  // namespace

extern "C" {

// program: n instructions as 8 parallel int64 arrays.
// memory: caller-provided buffer of mem_size bytes (address space 2).
// inputs: concatenated input items; input_lens[i] gives each length.
// pvs: 32-byte output buffer (address space 3).
ExecResult execute_e1(const int64_t* opcode, const int64_t* oa,
                      const int64_t* ob, const int64_t* oc,
                      const int64_t* od, const int64_t* oe,
                      const int64_t* of_, const int64_t* og, int64_t n_insns,
                      uint32_t pc_base, uint32_t pc_start, uint8_t* memory,
                      uint64_t mem_size, const uint8_t* inputs,
                      const int64_t* input_lens, int64_t n_inputs,
                      uint8_t* pvs, uint64_t pv_size, uint64_t max_insns) {
  ExecResult res{-1, 0, pc_start, 0};
  uint32_t regs[32] = {0};
  uint32_t pc = pc_start;
  uint64_t instret = 0;

  std::vector<uint8_t> hint;
  size_t hint_pos = 0;
  int64_t next_input = 0;
  const uint8_t* input_ptr = inputs;

  auto mem_ok = [&](uint64_t addr, uint64_t len) {
    return addr + len <= mem_size;
  };

  for (;;) {
    if (max_insns && instret >= max_insns) { res.error = 5; break; }
    int64_t idx = (static_cast<int64_t>(pc) - pc_base) / 4;
    if (idx < 0 || idx >= n_insns) { res.error = 1; break; }
    const int64_t op = opcode[idx];
    const uint32_t a = static_cast<uint32_t>(oa[idx]);
    const uint32_t b = static_cast<uint32_t>(ob[idx]);
    const uint32_t c = static_cast<uint32_t>(oc[idx]);
    const uint32_t e = static_cast<uint32_t>(oe[idx]);
    const uint32_t f = static_cast<uint32_t>(of_[idx]);
    const uint32_t g = static_cast<uint32_t>(og[idx]);
    instret++;

    if (op >= ADD && op <= AND_) {
      uint32_t x = regs[b / 4];
      uint32_t y;
      if (e == 0) {  // u24 immediate, sign-extended from bit 23
        uint32_t imm = c & 0xFFFFFF;
        y = (imm & 0x800000) ? (imm | 0xFF000000) : imm;
      } else {
        y = regs[c / 4];
      }
      uint32_t v;
      switch (op) {
        case ADD: v = x + y; break;
        case SUB: v = x - y; break;
        case XOR_: v = x ^ y; break;
        case OR_: v = x | y; break;
        default: v = x & y; break;
      }
      if (a) regs[a / 4] = v;
      pc += 4;
    } else if (op >= SLL && op <= SRA) {
      uint32_t x = regs[b / 4];
      uint32_t sh = (e == 0 ? c : regs[c / 4]) & 31;
      uint32_t v = op == SLL ? (x << sh)
                 : op == SRL ? (x >> sh)
                 : static_cast<uint32_t>(sx32(x) >> sh);
      if (a) regs[a / 4] = v;
      pc += 4;
    } else if (op == SLT || op == SLTU) {
      uint32_t x = regs[b / 4];
      uint32_t y;
      if (e == 0) {
        uint32_t imm = c & 0xFFFFFF;
        y = (imm & 0x800000) ? (imm | 0xFF000000) : imm;
      } else {
        y = regs[c / 4];
      }
      uint32_t v = op == SLT ? (sx32(x) < sx32(y)) : (x < y);
      if (a) regs[a / 4] = v;
      pc += 4;
    } else if (op >= LOADW && op <= LOADH) {
      uint32_t imm = (c & 0xFFFF) | (g ? 0xFFFF0000u : 0);
      uint32_t addr = regs[b / 4] + imm;
      bool is_store = (op == STOREW || op == STOREH || op == STOREB);
      if (is_store) {
        uint32_t val = regs[a / 4];
        if (e == 3) {  // reveal: address space 3 = public values
          if (addr + 4 <= pv_size) std::memcpy(pvs + addr, &val, 4);
        } else {
          if (!mem_ok(addr, 4)) { res.error = 1; break; }
          if (op == STOREW) std::memcpy(memory + addr, &val, 4);
          else if (op == STOREH) std::memcpy(memory + addr, &val, 2);
          else memory[addr] = val & 0xFF;
        }
      } else {
        if (!mem_ok(addr, 4)) { res.error = 1; break; }
        uint32_t v = 0;
        switch (op) {
          case LOADW: std::memcpy(&v, memory + addr, 4); break;
          case LOADBU: v = memory[addr]; break;
          case LOADHU: { uint16_t h; std::memcpy(&h, memory + addr, 2);
                         v = h; break; }
          case LOADB: v = static_cast<uint32_t>(
                          static_cast<int8_t>(memory[addr])); break;
          default: { uint16_t h; std::memcpy(&h, memory + addr, 2);
                     v = static_cast<uint32_t>(static_cast<int16_t>(h));
                     break; }
        }
        if (f && a) regs[a / 4] = v;
      }
      pc += 4;
    } else if (op == BEQ || op == BNE) {
      bool eq = regs[a / 4] == regs[b / 4];
      bool taken = (op == BEQ) ? eq : !eq;
      int32_t off = c > kP / 2 ? static_cast<int32_t>(c - kP) : c;
      pc = taken ? pc + off : pc + 4;
    } else if (op >= BLT && op <= BGEU) {
      uint32_t x = regs[a / 4], y = regs[b / 4];
      bool lt = (op == BLT || op == BGE) ? (sx32(x) < sx32(y)) : (x < y);
      bool taken = (op == BLT || op == BLTU) ? lt : !lt;
      int32_t off = c > kP / 2 ? static_cast<int32_t>(c - kP) : c;
      pc = taken ? pc + off : pc + 4;
    } else if (op == JAL) {
      if (f && a) regs[a / 4] = pc + 4;
      int32_t off = c > kP / 2 ? static_cast<int32_t>(c - kP) : c;
      pc += off;
    } else if (op == LUI) {
      if (a) regs[a / 4] = c << 12;
      pc += 4;
    } else if (op == JALR) {
      uint32_t imm = (c & 0xFFFF) | (g ? 0xFFFF0000u : 0);
      uint32_t target = (regs[b / 4] + imm) & ~1u;
      if (f && a) regs[a / 4] = pc + 4;
      pc = target;
    } else if (op == AUIPC) {
      if (a) regs[a / 4] = pc + (c << 8);
      pc += 4;
    } else if (op == MUL) {
      if (a) regs[a / 4] = regs[b / 4] * regs[c / 4];
      pc += 4;
    } else if (op >= MULH && op <= MULHU) {
      int64_t x = sx32(regs[b / 4]), y = sx32(regs[c / 4]);
      uint64_t xu = regs[b / 4], yu = regs[c / 4];
      uint64_t prod = op == MULH ? static_cast<uint64_t>(x * y)
                    : op == MULHSU ? static_cast<uint64_t>(x * static_cast<int64_t>(yu))
                    : xu * yu;
      if (a) regs[a / 4] = static_cast<uint32_t>(prod >> 32);
      pc += 4;
    } else if (op >= DIV && op <= REMU) {
      uint32_t xu = regs[b / 4], yu = regs[c / 4];
      int32_t x = sx32(xu), y = sx32(yu);
      uint32_t v;
      switch (op) {
        case DIV:
          v = yu == 0 ? 0xFFFFFFFFu
            : (x == INT32_MIN && y == -1) ? 0x80000000u
            : static_cast<uint32_t>(x / y);
          break;
        case DIVU: v = yu == 0 ? 0xFFFFFFFFu : xu / yu; break;
        case REM:
          v = yu == 0 ? xu
            : (x == INT32_MIN && y == -1) ? 0
            : static_cast<uint32_t>(x % y);
          break;
        default: v = yu == 0 ? xu : xu % yu; break;
      }
      if (a) regs[a / 4] = v;
      pc += 4;
    } else if ((op >= 0x400 && op <= 0x409) || op == 0x450 ||
               (op >= 0x420 && op <= 0x428)) {
      // Int256 (bigint) extension: 256-bit heap ops (vm/circuit/bigint.py)
      const bool is_branch = op >= 0x420 && op <= 0x428;
      uint32_t p1 = is_branch ? regs[a / 4] : regs[b / 4];
      uint32_t p2 = is_branch ? regs[b / 4] : regs[c / 4];
      uint32_t pd = is_branch ? 0 : regs[a / 4];
      auto bad_ptr = [](uint32_t p) {
        return (p % 4) || p >= (1u << 29);
      };
      if (bad_ptr(p1) || bad_ptr(p2) || (!is_branch && bad_ptr(pd))) {
        res.error = 1; break;
      }
      if (!mem_ok(p1, 32) || !mem_ok(p2, 32) ||
          (!is_branch && !mem_ok(pd, 32))) { res.error = 1; break; }
      uint64_t x[4], y[4], z[4] = {0, 0, 0, 0};
      std::memcpy(x, memory + p1, 32);
      std::memcpy(y, memory + p2, 32);
      auto add256 = [](const uint64_t* u, const uint64_t* v, uint64_t* w) {
        unsigned __int128 cr = 0;
        for (int i = 0; i < 4; i++) {
          cr += static_cast<unsigned __int128>(u[i]) + v[i];
          w[i] = static_cast<uint64_t>(cr);
          cr >>= 64;
        }
      };
      auto sub256 = [](const uint64_t* u, const uint64_t* v, uint64_t* w) {
        unsigned __int128 br = 0;
        for (int i = 0; i < 4; i++) {
          unsigned __int128 d = static_cast<unsigned __int128>(u[i])
              - v[i] - static_cast<uint64_t>(br);
          w[i] = static_cast<uint64_t>(d);
          br = (d >> 64) ? 1 : 0;
        }
      };
      auto ltu256 = [](const uint64_t* u, const uint64_t* v) {
        for (int i = 3; i >= 0; i--) {
          if (u[i] != v[i]) return u[i] < v[i];
        }
        return false;
      };
      auto lts256 = [&](const uint64_t* u, const uint64_t* v) {
        bool su = u[3] >> 63, sv = v[3] >> 63;
        if (su != sv) return su;
        return ltu256(u, v);
      };
      auto shl256 = [](const uint64_t* u, unsigned s, uint64_t* w) {
        unsigned wsh = s / 64, bsh = s % 64;
        for (int i = 3; i >= 0; i--) {
          uint64_t v = 0;
          int src = i - static_cast<int>(wsh);
          if (src >= 0) v = u[src] << bsh;
          if (bsh && src - 1 >= 0) v |= u[src - 1] >> (64 - bsh);
          w[i] = v;
        }
      };
      auto shr256 = [](const uint64_t* u, unsigned s, uint64_t fill,
                       uint64_t* w) {
        unsigned wsh = s / 64, bsh = s % 64;
        for (int i = 0; i < 4; i++) {
          uint64_t v;
          unsigned src = i + wsh;
          v = src < 4 ? u[src] >> bsh : fill;
          if (bsh) {
            uint64_t hi = src + 1 < 4 ? u[src + 1] : fill;
            v |= hi << (64 - bsh);
          }
          w[i] = v;
        }
      };
      auto mul256 = [](const uint64_t* u, const uint64_t* v, uint64_t* w) {
        uint64_t acc[4] = {0, 0, 0, 0};
        for (int i = 0; i < 4; i++) {
          unsigned __int128 carry = 0;
          for (int j = 0; i + j < 4; j++) {
            unsigned __int128 t = static_cast<unsigned __int128>(u[i]) * v[j]
                + acc[i + j] + static_cast<uint64_t>(carry);
            acc[i + j] = static_cast<uint64_t>(t);
            carry = t >> 64;
          }
        }
        std::memcpy(w, acc, 32);
      };
      if (is_branch) {
        bool taken;
        if (op == 0x420) taken = std::memcmp(x, y, 32) == 0;
        else if (op == 0x421) taken = std::memcmp(x, y, 32) != 0;
        else {
          bool lt = (op == 0x425 || op == 0x427) ? lts256(x, y)
                                                 : ltu256(x, y);
          taken = (op == 0x425 || op == 0x426) ? lt : !lt;
        }
        int32_t off = c > kP / 2 ? static_cast<int32_t>(c - kP) : c;
        pc = taken ? pc + off : pc + 4;
      } else {
        unsigned s = static_cast<unsigned>(y[0] & 255);
        switch (op) {
          case 0x400: add256(x, y, z); break;
          case 0x401: sub256(x, y, z); break;
          case 0x402: for (int i = 0; i < 4; i++) z[i] = x[i] ^ y[i]; break;
          case 0x403: for (int i = 0; i < 4; i++) z[i] = x[i] | y[i]; break;
          case 0x404: for (int i = 0; i < 4; i++) z[i] = x[i] & y[i]; break;
          case 0x405: shl256(x, s, z); break;
          case 0x406: shr256(x, s, 0, z); break;
          case 0x407: shr256(x, s, (x[3] >> 63) ? ~0ull : 0, z); break;
          case 0x408: z[0] = lts256(x, y); break;
          case 0x409: z[0] = ltu256(x, y); break;
          default: mul256(x, y, z); break;  // 0x450
        }
        std::memcpy(memory + pd, z, 32);
        pc += 4;
      }
    } else if (op == HINT_STOREW || op == HINT_BUFFER) {
      uint32_t mem_ptr = regs[b / 4];
      uint32_t num_words = op == HINT_STOREW ? 1 : regs[a / 4];
      if (hint.size() - hint_pos < 4ull * num_words) { res.error = 3; break; }
      if (!mem_ok(mem_ptr, 4ull * num_words)) { res.error = 1; break; }
      std::memcpy(memory + mem_ptr, hint.data() + hint_pos,
                  4ull * num_words);
      hint_pos += 4ull * num_words;
      pc += 4;
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
      } else if (disc >= 0x30) {
        // extension phantoms (e.g. pairing HintFinalExp) need host
        // bigint arithmetic: bail so the Python path handles them
        res.error = 2;
        break;
      }
      // other phantoms: nop at E1 level (print suppressed natively)
      pc += 4;
    } else if (op == TERMINATE) {
      res.exit_code = oc[idx];
      break;
    } else {
      res.error = 2;
      break;
    }
  }
  res.instret = instret;
  res.final_pc = pc;
  return res;
}

}  // extern "C"
