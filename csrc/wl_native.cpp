// wl_native — native host-side audio kernels for whisperlive-tpu.
//
// The reference offloads all native work to external wheels (CTranslate2,
// onnxruntime, PyAV); this framework's host hot paths live here instead:
//   * a FLAC decoder (subset: 8/16/24-bit, mono/stereo, fixed+LPC subframes,
//     4/5-bit Rice residuals, all stereo decorrelation modes) — the pure-
//     Python fallback in audio/flac.py is ~100x slower on one core
//   * PCM int16/uint8 -> float32 conversion
//
// Built with setuptools via the CPython C API (no pybind11 dependency);
// audio/flac.py falls back to pure Python when the extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cmath>
#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size, size_t byte_pos = 0)
      : data_(data), size_(size), pos_(byte_pos), bit_(0) {}

  uint64_t ReadBits(int n) {
    uint64_t out = 0;
    while (n > 0) {
      if (pos_ >= size_) throw std::runtime_error("flac: eof");
      int avail = 8 - bit_;
      int take = n < avail ? n : avail;
      int shift = avail - take;
      out = (out << take) | ((data_[pos_] >> shift) & ((1u << take) - 1));
      bit_ += take;
      if (bit_ == 8) {
        ++pos_;
        bit_ = 0;
      }
      n -= take;
    }
    return out;
  }

  int64_t ReadSigned(int n) {
    uint64_t v = ReadBits(n);
    if (n > 0 && (v >> (n - 1)) & 1) {
      return static_cast<int64_t>(v) - (1ll << n);
    }
    return static_cast<int64_t>(v);
  }

  int ReadUnary() {
    int count = 0;
    for (;;) {
      if (pos_ >= size_) throw std::runtime_error("flac: eof in unary");
      int rem = 8 - bit_;
      uint8_t chunk = data_[pos_] & ((1u << rem) - 1);
      if (chunk == 0) {
        count += rem;
        ++pos_;
        bit_ = 0;
        continue;
      }
      int msb = 31 - __builtin_clz(chunk);  // position of top set bit
      int lead = rem - 1 - msb;
      count += lead;
      bit_ += lead + 1;
      if (bit_ == 8) {
        ++pos_;
        bit_ = 0;
      }
      return count;
    }
  }

  void Align() {
    if (bit_) {
      ++pos_;
      bit_ = 0;
    }
  }

  size_t byte_pos() const { return pos_; }

 private:
  const uint8_t* data_;
  size_t size_;
  size_t pos_;
  int bit_;
};

uint64_t ReadUtf8Number(BitReader& br) {
  uint64_t b0 = br.ReadBits(8);
  if (b0 < 0x80) return b0;
  int n = 0;
  uint64_t mask = 0x80;
  while (b0 & mask) {
    ++n;
    mask >>= 1;
  }
  uint64_t val = b0 & (mask - 1);
  for (int i = 0; i < n - 1; ++i) val = (val << 6) | (br.ReadBits(8) & 0x3F);
  return val;
}

const int kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, -1,   -2,
                             256, 512,  1024, 2048, 4096, 8192, 16384, 32768};
const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

void DecodeResidual(BitReader& br, int block_size, int order,
                    std::vector<int64_t>& residual) {
  int method = static_cast<int>(br.ReadBits(2));
  if (method > 1) throw std::runtime_error("flac: bad residual method");
  int param_bits = method == 0 ? 4 : 5;
  int escape = (1 << param_bits) - 1;
  int partition_order = static_cast<int>(br.ReadBits(4));
  int n_partitions = 1 << partition_order;
  residual.resize(block_size - order);
  size_t idx = 0;
  for (int p = 0; p < n_partitions; ++p) {
    int count = block_size >> partition_order;
    if (p == 0) count -= order;
    int param = static_cast<int>(br.ReadBits(param_bits));
    if (param == escape) {
      int bits = static_cast<int>(br.ReadBits(5));
      for (int i = 0; i < count; ++i)
        residual[idx++] = bits ? br.ReadSigned(bits) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint64_t q = br.ReadUnary();
        uint64_t r = param ? br.ReadBits(param) : 0;
        uint64_t v = (q << param) | r;
        residual[idx++] = static_cast<int64_t>(v >> 1) ^ -static_cast<int64_t>(v & 1);
      }
    }
  }
}

void DecodeSubframe(BitReader& br, int block_size, int bps,
                    std::vector<int64_t>& out) {
  if (br.ReadBits(1) != 0) throw std::runtime_error("flac: subframe pad bit");
  int sf_type = static_cast<int>(br.ReadBits(6));
  int wasted = 0;
  if (br.ReadBits(1)) {
    wasted = 1 + br.ReadUnary();
    bps -= wasted;
  }
  out.resize(block_size);
  std::vector<int64_t> residual;

  if (sf_type == 0) {  // constant
    int64_t v = br.ReadSigned(bps);
    std::fill(out.begin(), out.end(), v);
  } else if (sf_type == 1) {  // verbatim
    for (int i = 0; i < block_size; ++i) out[i] = br.ReadSigned(bps);
  } else if (sf_type >= 8 && sf_type <= 12) {  // fixed
    int order = sf_type - 8;
    for (int i = 0; i < order; ++i) out[i] = br.ReadSigned(bps);
    DecodeResidual(br, block_size, order, residual);
    static const int kCoef[5][4] = {
        {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += kCoef[order][j] * out[i - 1 - j];
      out[i] = residual[i - order] + pred;
    }
  } else if (sf_type >= 32) {  // LPC
    int order = sf_type - 31;
    for (int i = 0; i < order; ++i) out[i] = br.ReadSigned(bps);
    int precision = static_cast<int>(br.ReadBits(4)) + 1;
    int shift = static_cast<int>(br.ReadSigned(5));
    std::vector<int64_t> coeffs(order);
    for (int i = 0; i < order; ++i) coeffs[i] = br.ReadSigned(precision);
    DecodeResidual(br, block_size, order, residual);
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coeffs[j] * out[i - 1 - j];
      out[i] = residual[i - order] + (pred >> shift);
    }
  } else {
    throw std::runtime_error("flac: reserved subframe type");
  }
  if (wasted) {
    for (auto& v : out) v <<= wasted;
  }
}

// Decode a whole FLAC stream into interleaved-averaged mono float32.
PyObject* DecodeFlac(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  const uint8_t* data = static_cast<const uint8_t*>(buf.buf);
  size_t size = buf.len;

  PyObject* result = nullptr;
  try {
    if (size < 4 || memcmp(data, "fLaC", 4) != 0)
      throw std::runtime_error("not a FLAC stream");
    size_t pos = 4;
    int sample_rate = 0, n_channels = 0, bps = 0;
    uint64_t total_samples = 0;
    for (;;) {
      if (pos + 4 > size) throw std::runtime_error("flac: truncated metadata");
      bool last = data[pos] & 0x80;
      int btype = data[pos] & 0x7F;
      uint32_t length =
          (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
      if (btype == 0) {
        BitReader br(data + pos + 4, length);
        br.ReadBits(16); br.ReadBits(16); br.ReadBits(24); br.ReadBits(24);
        sample_rate = static_cast<int>(br.ReadBits(20));
        n_channels = static_cast<int>(br.ReadBits(3)) + 1;
        bps = static_cast<int>(br.ReadBits(5)) + 1;
        total_samples = br.ReadBits(36);
      }
      pos += 4 + length;
      if (last) break;
    }
    if (!sample_rate) throw std::runtime_error("flac: missing STREAMINFO");

    std::vector<double> mono;
    if (total_samples) mono.reserve(total_samples);
    std::vector<std::vector<int64_t>> subframes(n_channels);

    BitReader br(data, size, pos);
    double scale = 1.0 / (1ll << (bps - 1));
    while (br.byte_pos() < size - 2) {
      if (br.ReadBits(14) != 0x3FFE)
        throw std::runtime_error("flac: lost frame sync");
      br.ReadBits(1); br.ReadBits(1);
      int bs_code = static_cast<int>(br.ReadBits(4));
      int sr_code = static_cast<int>(br.ReadBits(4));
      int ch_code = static_cast<int>(br.ReadBits(4));
      int ss_code = static_cast<int>(br.ReadBits(3));
      br.ReadBits(1);
      ReadUtf8Number(br);
      int block_size;
      if (bs_code == 6) block_size = static_cast<int>(br.ReadBits(8)) + 1;
      else if (bs_code == 7) block_size = static_cast<int>(br.ReadBits(16)) + 1;
      else block_size = kBlockSizes[bs_code];
      if (sr_code == 12) br.ReadBits(8);
      else if (sr_code == 13 || sr_code == 14) br.ReadBits(16);
      int frame_bps = kSampleSizes[ss_code] ? kSampleSizes[ss_code] : bps;
      br.ReadBits(8);  // CRC-8

      if (ch_code < 8) {
        for (int c = 0; c <= ch_code; ++c)
          DecodeSubframe(br, block_size, frame_bps, subframes[c]);
      } else if (ch_code == 8) {  // left/side
        DecodeSubframe(br, block_size, frame_bps, subframes[0]);
        DecodeSubframe(br, block_size, frame_bps + 1, subframes[1]);
        for (int i = 0; i < block_size; ++i)
          subframes[1][i] = subframes[0][i] - subframes[1][i];
      } else if (ch_code == 9) {  // right/side
        DecodeSubframe(br, block_size, frame_bps + 1, subframes[0]);
        DecodeSubframe(br, block_size, frame_bps, subframes[1]);
        for (int i = 0; i < block_size; ++i)
          subframes[0][i] = subframes[1][i] + subframes[0][i];
      } else if (ch_code == 10) {  // mid/side
        DecodeSubframe(br, block_size, frame_bps, subframes[0]);
        DecodeSubframe(br, block_size, frame_bps + 1, subframes[1]);
        for (int i = 0; i < block_size; ++i) {
          int64_t mid = (subframes[0][i] << 1) | (subframes[1][i] & 1);
          int64_t side = subframes[1][i];
          subframes[0][i] = (mid + side) >> 1;
          subframes[1][i] = (mid - side) >> 1;
        }
      } else {
        throw std::runtime_error("flac: bad channel assignment");
      }
      br.Align();
      br.ReadBits(16);  // CRC-16

      int nch = ch_code < 8 ? ch_code + 1 : 2;
      for (int i = 0; i < block_size; ++i) {
        double acc = 0;
        for (int c = 0; c < nch; ++c) acc += subframes[c][i];
        mono.push_back(acc * scale / nch);
      }
      if (total_samples && mono.size() >= total_samples) break;
    }
    if (total_samples && mono.size() > total_samples) mono.resize(total_samples);

    PyObject* bytes = PyBytes_FromStringAndSize(nullptr, mono.size() * sizeof(float));
    if (!bytes) throw std::bad_alloc();
    float* out = reinterpret_cast<float*>(PyBytes_AS_STRING(bytes));
    for (size_t i = 0; i < mono.size(); ++i) out[i] = static_cast<float>(mono[i]);
    result = Py_BuildValue("(Ni)", bytes, sample_rate);
  } catch (const std::exception& e) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, e.what());
    return nullptr;
  }
  PyBuffer_Release(&buf);
  return result;
}

// int16 little-endian PCM -> float32 bytes (hot path of the wire decode).
PyObject* Int16ToFloat32(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  Py_ssize_t n = buf.len / 2;
  PyObject* bytes = PyBytes_FromStringAndSize(nullptr, n * sizeof(float));
  if (!bytes) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  const int16_t* in = static_cast<const int16_t*>(buf.buf);
  float* out = reinterpret_cast<float*>(PyBytes_AS_STRING(bytes));
  for (Py_ssize_t i = 0; i < n; ++i) out[i] = in[i] / 32768.0f;
  PyBuffer_Release(&buf);
  return bytes;
}

// float32 PCM -> int16 little-endian bytes (device-upload compression: the
// axon relay moves ~40 MB/s, so halving the bytes of a 30 s window batch
// saves ~170 ms per engine dispatch; int16 is source precision anyway).
PyObject* Float32ToInt16(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  Py_ssize_t n = buf.len / 4;
  PyObject* bytes = PyBytes_FromStringAndSize(nullptr, n * sizeof(int16_t));
  if (!bytes) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  const float* in = static_cast<const float*>(buf.buf);
  int16_t* out = reinterpret_cast<int16_t*>(PyBytes_AS_STRING(bytes));
  // Round-to-nearest (truncation doubles the quantization error) and clip
  // symmetrically at +/-32767: the device dequant divides by 32767, so the
  // symmetric clip keeps full-scale samples exactly inside [-1, 1].
  for (Py_ssize_t i = 0; i < n; ++i) {
    float v = in[i] * 32767.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32767.0f) v = -32767.0f;
    out[i] = static_cast<int16_t>(lrintf(v));
  }
  PyBuffer_Release(&buf);
  return bytes;
}

PyMethodDef kMethods[] = {
    {"decode_flac", DecodeFlac, METH_VARARGS,
     "decode_flac(data: bytes) -> (float32_pcm_bytes, sample_rate)"},
    {"int16_to_float32", Int16ToFloat32, METH_VARARGS,
     "int16 PCM bytes -> float32 PCM bytes"},
    {"float32_to_int16", Float32ToInt16, METH_VARARGS,
     "float32 PCM bytes -> int16 PCM bytes (clipped)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "wl_native",
    "Native host audio kernels for whisperlive-tpu", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit_wl_native(void) { return PyModule_Create(&kModule); }
