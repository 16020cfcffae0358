/* Fast Fortran-order RLE codec for instance masks.
 *
 * Native replacement for the reference's pure-Python mask_to_rle
 * (Instance_Segmentation_Model/model/utils.py:25-43) and rle_to_binary_mask
 * (Pose_Estimation_Model/utils/data_utils.py:72-89), which dominate the
 * host-side cost of writing/reading detection files at 100+ masks/frame.
 * Bound via ctypes (sam6d_tpu/native/__init__.py); the COCO-compressed
 * string layer stays in Python (string-heavy, not hot).
 */
#include <stdint.h>
#include <stddef.h>

/* Encode mask (h x w, row-major uint8) in FORTRAN order.
 * counts_out receives the run lengths starting with the zero-run.
 * Returns the number of counts written, or -1 if max_counts exceeded. */
long rle_encode_fortran(const uint8_t *mask, long h, long w,
                        uint32_t *counts_out, long max_counts) {
    long n = 0;
    uint8_t cur = 0;
    uint32_t run = 0;
    for (long x = 0; x < w; ++x) {
        const uint8_t *col = mask + x;
        for (long y = 0; y < h; ++y) {
            uint8_t v = col[(size_t)y * w] ? 1 : 0;
            if (v == cur) {
                ++run;
            } else {
                if (n >= max_counts) return -1;
                counts_out[n++] = run;
                cur = v;
                run = 1;
            }
        }
    }
    if (n >= max_counts) return -1;
    counts_out[n++] = run;
    return n;
}

/* Decode counts (starting with the zero-run) into mask (h x w row-major). */
void rle_decode_fortran(const uint32_t *counts, long n, long h, long w,
                        uint8_t *mask_out) {
    long pos = 0;
    uint8_t val = 0;
    long total = h * w;
    for (long i = 0; i < n && pos < total; ++i) {
        long run = counts[i];
        if (val) {
            long end = pos + run;
            if (end > total) end = total;
            for (long p = pos; p < end; ++p) {
                long y = p % h;
                long x = p / h;
                mask_out[(size_t)y * w + x] = 1;
            }
        }
        pos += run;
        val = !val;
    }
}
