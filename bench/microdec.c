/* Micro-benchmark driver for the native inflate hot loop: decode a raw
 * deflate blob N times, print MB/s. Build:
 *   gcc -O3 -march=native -o /tmp/microdec bench/microdec.c
 * Usage: microdec <raw_deflate_file> <orig_size> [reps]
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#define ZNG_HOST_STANDALONE 1
#include "../zlibng_tpu/native/zng_host.c"

int main(int argc, char **argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s blob orig_size [reps]\n", argv[0]); return 2; }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 2; }
    fseek(f, 0, SEEK_END);
    long nbytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t *data = malloc(nbytes + 16);
    if (fread(data, 1, nbytes, f) != (size_t)nbytes) return 2;
    fclose(f);
    memset(data + nbytes, 0, 16);

    long orig = atol(argv[2]);
    int reps = argc > 3 ? atoi(argv[3]) : 20;
    long out_cap = orig + 4096;
    uint8_t *out = malloc(out_cap);
    int32_t *lit_tbl = malloc((1L << 16) * sizeof(int32_t));
    int32_t *dist_tbl = malloc((1L << 16) * sizeof(int32_t));

    double best = 0;
    long olen = 0;
    for (int r = 0; r < reps; r++) {
        struct timespec t0, t1;
        clock_gettime(CLOCK_MONOTONIC, &t0);
        long bp = 0;
        int64_t st[8] = {0};
        olen = 0;
        long ncodes = 0;
        long ret = zng_inflate_stream(data, nbytes, &bp, st, lit_tbl,
                                      1L << 16, dist_tbl, 1L << 16, out,
                                      out_cap, &olen, 32768, 1, &ncodes, 0);
        clock_gettime(CLOCK_MONOTONIC, &t1);
        if (ret != 0) { fprintf(stderr, "ret=%ld olen=%ld\n", ret, olen); return 1; }
        double dt = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
        double mbps = olen / dt / 1e6;
        if (mbps > best) best = mbps;
    }
    printf("olen=%ld best=%.1f MB/s\n", olen, best);
    return 0;
}
