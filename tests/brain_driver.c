/* Test driver exposing the reference comparator (main/brain.c) as a CLI
 * oracle.  The build fixture copies the reference sources into a temp dir
 * (patching define.h's WIDTH/HEIGHT to the test geometry) and compiles
 * this driver next to them; nothing from the reference is checked in.
 *
 * Modes:
 *   adjust              stdin lines "x y X Y" (run-extent rects) ->
 *                       enlargeAdjust -> stdout lines "x y w h"
 *   compare A B         A/B: raw subsampled RGB files (3*PIX_LEN/16 bytes)
 *                       -> compare(A, B) -> stdout lines "x y w h"
 *   subsample A         A: raw full-res RGB file (3*PIX_LEN bytes) ->
 *                       subsample -> raw bytes on stdout (channel-swapped
 *                       by the reference: out = BGR of the box means)
 */
#include "../include/brain.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static uint8_t bufa[3 * PIX_LEN / 16], bufb[3 * PIX_LEN / 16];
static uint8_t fullbuf[3 * PIX_LEN];
static area_t outs[128];
static pair_t differences[2][WIDTH / 8];

static int read_file(const char *path, uint8_t *dst, size_t n) {
  FILE *f = fopen(path, "rb");
  if (!f) return 0;
  size_t got = fread(dst, 1, n, f);
  fclose(f);
  return got == n;
}

int main(int argc, char **argv) {
  if (argc >= 2 && !strcmp(argv[1], "adjust")) {
    area_t a;
    while (scanf("%d %d %d %d", &a.x, &a.y, &a.w, &a.h) == 4) {
      enlargeAdjust(&a);
      printf("%d %d %d %d\n", a.x, a.y, a.w, a.h);
    }
    return 0;
  }
  if (argc >= 4 && !strcmp(argv[1], "compare")) {
    if (!read_file(argv[2], bufa, sizeof bufa)) return 2;
    if (!read_file(argv[3], bufb, sizeof bufb)) return 2;
    int n = compare(bufa, bufb, outs, differences);
    for (int i = 0; i < n; i++)
      printf("%d %d %d %d\n", outs[i].x, outs[i].y, outs[i].w, outs[i].h);
    return 0;
  }
  if (argc >= 3 && !strcmp(argv[1], "subsample")) {
    if (!read_file(argv[2], fullbuf, sizeof fullbuf)) return 2;
    FILE *devnull = fopen("/dev/null", "w");
    if (!devnull) return 2;
    subsample(devnull, fullbuf, bufa);
    fclose(devnull);
    fwrite(bufa, 1, sizeof bufa, stdout);
    return 0;
  }
  fprintf(stderr, "usage: %s adjust|compare A B|subsample A\n", argv[0]);
  return 1;
}
