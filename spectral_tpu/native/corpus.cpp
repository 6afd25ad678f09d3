// Native host-side data path for the spectral LM trainers.
//
// TPU-native equivalent of the reference's native layer (the CUDA extension
// handled device-side work; on TPU the device side is XLA/Pallas, and the
// host-side data path — corpus sanitize + batched window gathers feeding the
// per-step H2D transfer (SURVEY.md §3.1 "corpus stays CPU; windows
// transferred per micro-batch") — is the part that belongs in native code).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build:  cc -O3 -march=native -shared -fPIC corpus.cpp -o libspectral_host.so

#include <cstdint>
#include <cstring>

extern "C" {

// Keep \n (10) and printable ASCII [32, 126]; everything else -> space.
// In-place variant of the reference's load_corpus_as_u8 sanitize
// (train_fixed_full.py:115-126).
void sanitize_ascii(const uint8_t* src, uint8_t* dst, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        uint8_t b = src[i];
        dst[i] = (b == 10 || (b >= 32 && b <= 126)) ? b : 32;
    }
}

// Gather B windows of `width` bytes at `starts` into out [B, width], widened
// to int32 (what the device wants — saves the astype pass in numpy).
void gather_windows_i32(const uint8_t* corpus, int64_t corpus_len,
                        const int64_t* starts, int64_t batch, int64_t width,
                        int32_t* out) {
    for (int64_t b = 0; b < batch; ++b) {
        const uint8_t* src = corpus + starts[b];
        int32_t* dst = out + b * width;
        for (int64_t i = 0; i < width; ++i) dst[i] = (int32_t)src[i];
    }
}

// Fused LM batch: for each start s emit x = bytes[s, s+T) and y = bytes
// shifted by one — one pass instead of gather + two slices + two astypes.
void lm_batch_i32(const uint8_t* corpus, int64_t corpus_len,
                  const int64_t* starts, int64_t batch, int64_t seq_len,
                  int32_t* x_out, int32_t* y_out) {
    for (int64_t b = 0; b < batch; ++b) {
        const uint8_t* src = corpus + starts[b];
        int32_t* xd = x_out + b * seq_len;
        int32_t* yd = y_out + b * seq_len;
        for (int64_t i = 0; i < seq_len; ++i) {
            xd[i] = (int32_t)src[i];
            yd[i] = (int32_t)src[i + 1];
        }
    }
}

// Word-boundary labels (segmentation head, segmentation_head.py:58-99):
// out[t] = 1 if byte t+1 is space/punct/newline; last position always 1.
void word_boundaries(const int32_t* bytes, int64_t batch, int64_t seq_len,
                     float* out) {
    for (int64_t b = 0; b < batch; ++b) {
        const int32_t* src = bytes + b * seq_len;
        float* dst = out + b * seq_len;
        for (int64_t t = 0; t < seq_len - 1; ++t) {
            int32_t nxt = src[t + 1];
            bool sep = (nxt == 32) || (nxt >= 33 && nxt <= 47) ||
                       (nxt >= 58 && nxt <= 64) || (nxt >= 91 && nxt <= 96) ||
                       (nxt >= 123 && nxt <= 126) || (nxt == 10) || (nxt == 13);
            dst[t] = sep ? 1.0f : 0.0f;
        }
        dst[seq_len - 1] = 1.0f;
    }
}

}  // extern "C"
