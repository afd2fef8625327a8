// Host-CPU baseline for the UMAP layout: a -O3 C++ transliteration of
// the published sequential SGD (umap-learn's optimize_layout_euclidean
// semantics: per-edge epochs_per_sample schedule, move_other attract,
// per-visit negative sampling, clip(+-4), linear alpha decay).
// umap-learn itself (numba) is not installable in this zero-egress
// image, so this native build is the honest stand-in — same inner loop,
// compiled machine code, single thread (umap-learn runs single-threaded
// when seeded).  Written from the algorithm description; no library
// code copied.
//
// Usage: umap_host_baseline <edges.bin> <n> <epochs>
//   edges.bin: int32 E; then E int32 heads, E int32 tails,
//              E float32 epochs_per_sample; then n*2 float32 init pos.
// Prints one JSON line with wall seconds.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

static inline float clip4(float x) {
    return x > 4.0f ? 4.0f : (x < -4.0f ? -4.0f : x);
}

int main(int argc, char** argv) {
    if (argc < 4) { fprintf(stderr, "args\n"); return 2; }
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 2; }
    long n = atol(argv[2]);
    int epochs = atoi(argv[3]);
    int32_t e32;
    if (fread(&e32, 4, 1, f) != 1) return 2;
    long e = e32;
    std::vector<int32_t> heads(e), tails(e);
    std::vector<float> eps(e), pos(2 * n);
    if (fread(heads.data(), 4, e, f) != (size_t)e) return 2;
    if (fread(tails.data(), 4, e, f) != (size_t)e) return 2;
    if (fread(eps.data(), 4, e, f) != (size_t)e) return 2;
    if (fread(pos.data(), 4, 2 * n, f) != (size_t)(2 * n)) return 2;
    fclose(f);

    const float a = 1.57694f, b = 0.8951f;  // min_dist=0.1 fit
    const float neg_rate = 5.0f;
    std::vector<float> eons(e), eonns(e);
    for (long i = 0; i < e; i++) { eons[i] = eps[i]; eonns[i] = eps[i] / neg_rate; }

    uint64_t rng = 0x9E3779B97F4A7C15ull;
    auto rnd = [&rng]() {
        rng ^= rng << 13; rng ^= rng >> 7; rng ^= rng << 17; return rng;
    };

    auto t0 = std::chrono::steady_clock::now();
    for (int ep = 0; ep < epochs; ep++) {
        float alpha = 1.0f - (float)ep / (float)epochs;
        for (long i = 0; i < e; i++) {
            if (eons[i] > ep) continue;
            float* cur = &pos[2 * heads[i]];
            float* oth = &pos[2 * tails[i]];
            float dx = cur[0] - oth[0], dy = cur[1] - oth[1];
            float d2 = dx * dx + dy * dy;
            if (d2 > 0.0f) {
                float gc = (-2.0f * a * b * powf(d2, b - 1.0f))
                           / (a * powf(d2, b) + 1.0f);
                float gx = clip4(gc * dx) * alpha, gy = clip4(gc * dy) * alpha;
                cur[0] += gx; cur[1] += gy;
                oth[0] -= gx; oth[1] -= gy;
            }
            eons[i] += eps[i];
            int nneg = (int)(((float)ep - eonns[i]) * neg_rate / eps[i]);
            for (int p = 0; p < nneg; p++) {
                long k = (long)(rnd() % (uint64_t)n);
                float* o2 = &pos[2 * k];
                float ex = cur[0] - o2[0], ey = cur[1] - o2[1];
                float dn = ex * ex + ey * ey;
                float gx, gy;
                if (dn > 0.0f) {
                    float gc = 2.0f * b / ((0.001f + dn)
                               * (a * powf(dn, b) + 1.0f));
                    gx = clip4(gc * ex) * alpha; gy = clip4(gc * ey) * alpha;
                } else if (heads[i] == k) { continue; }
                else { gx = 4.0f * alpha; gy = 4.0f * alpha; }
                cur[0] += gx; cur[1] += gy;
            }
            eonns[i] += nneg * eps[i] / neg_rate;
        }
    }
    double dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    // checksum defeats dead-code elimination
    double s = 0; for (long i = 0; i < 2 * n; i += 997) s += pos[i];
    printf("{\"epochs\": %d, \"seconds\": %.3f, \"per_epoch_s\": %.4f, \"checksum\": %.3f}\n",
           epochs, dt, dt / epochs, s);
    return 0;
}
