/* Minimal libpng CLI shim for the PNG interop tests
 * (tests/test_png_interop.py). Compiled at test time with
 *     gcc -O2 -o png_shim png_interop.c -lpng
 *
 * Usage:
 *   png_shim decode <in.png> <out.ppm>
 *       any PNG -> P6 RGB8, normalized with the same conventions the
 *       python decoder uses: palette resolved, sub-byte gray expanded
 *       by bit replication, 16-bit reduced to the HIGH byte
 *       (png_set_strip_16), alpha DROPPED (not composited), gray
 *       replicated to RGB.
 *   png_shim encode <in.ppm> <out.png> <color 0|2|3|4|6> <depth> <interlace 0|1>
 *       P6 -> color 2/3/6; P5 -> color 0/4. depth 8/16 everywhere,
 *       plus 1/2/4 for gray (values must be exact bit-replication
 *       points; the shim right-shifts to the target depth). Color 4/6
 *       synthesize a varying alpha channel (pixel-index pattern), so a
 *       decoder that composites instead of dropping alpha fails the
 *       byte-equality checks. Palette is built from unique colors
 *       (dies above 256).
 *
 * libpng's error model is setjmp/longjmp; the handler exits non-zero,
 * which is the failure signal the tests want.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <png.h>

static void die(const char *msg) {
    fprintf(stderr, "png_shim: %s\n", msg);
    exit(2);
}

static void decode_cmd(const char *in_path, const char *out_path) {
    FILE *fi = fopen(in_path, "rb");
    if (!fi) die("cannot open input png");
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
    png_infop info = png_create_info_struct(png);
    if (!png || !info) die("png alloc");
    if (setjmp(png_jmpbuf(png))) die("libpng read error");
    png_init_io(png, fi);
    png_read_info(png, info);

    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (depth == 16) png_set_strip_16(png); /* high byte, like ours */
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    png_read_update_info(png, info);

    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    size_t stride = png_get_rowbytes(png, info);
    if (stride != (size_t)w * 3) die("unexpected rowbytes after transforms");

    unsigned char *pixels = malloc(stride * h);
    png_bytep *rows = malloc(h * sizeof(png_bytep));
    if (!pixels || !rows) die("oom");
    for (png_uint_32 r = 0; r < h; r++) rows[r] = pixels + r * stride;
    png_read_image(png, rows); /* handles Adam7 internally */
    png_read_end(png, NULL);
    png_destroy_read_struct(&png, &info, NULL);
    fclose(fi);

    FILE *fo = fopen(out_path, "wb");
    if (!fo) die("cannot open output ppm");
    fprintf(fo, "P6\n%u %u\n255\n", w, h);
    if (fwrite(pixels, 1, stride * h, fo) != stride * h) die("short write");
    fclose(fo);
    free(pixels);
    free(rows);
}

static unsigned char *read_ppm(const char *path, int *w, int *h, int *ncomp) {
    FILE *f = fopen(path, "rb");
    if (!f) die("cannot open input ppm");
    char magic[3] = {0};
    int maxval = 0;
    if (fscanf(f, "%2s %d %d %d", magic, w, h, &maxval) != 4) die("bad ppm header");
    if (fgetc(f) == EOF) die("truncated ppm");
    if (strcmp(magic, "P6") == 0) *ncomp = 3;
    else if (strcmp(magic, "P5") == 0) *ncomp = 1;
    else die("unsupported ppm magic");
    if (maxval != 255) die("maxval must be 255");
    size_t n = (size_t)(*w) * (*h) * (*ncomp);
    unsigned char *buf = malloc(n);
    if (!buf) die("oom");
    if (fread(buf, 1, n, f) != n) die("truncated ppm payload");
    fclose(f);
    return buf;
}

static void encode_cmd(const char *in_path, const char *out_path,
                       int color, int depth, int interlace) {
    int w, h, ncomp;
    unsigned char *pixels = read_ppm(in_path, &w, &h, &ncomp);
    if ((color == 0 || color == 4) && ncomp != 1) die("gray colortype needs P5");
    if ((color == 2 || color == 3 || color == 6) && ncomp != 3) die("color type needs P6");

    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
    png_infop info = png_create_info_struct(png);
    if (!png || !info) die("png alloc");
    if (setjmp(png_jmpbuf(png))) die("libpng write error");
    FILE *fo = fopen(out_path, "wb");
    if (!fo) die("cannot open output png");
    png_init_io(png, fo);
    png_set_IHDR(png, info, w, h, depth, color,
                 interlace ? PNG_INTERLACE_ADAM7 : PNG_INTERLACE_NONE,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);

    /* output channel count (before any packing/expansion transforms) */
    int out_ch = (color == 2) ? 3 : (color == 6) ? 4 : (color == 4) ? 2 : 1;
    int bytes_per_sample = depth == 16 ? 2 : 1;
    size_t stride = (size_t)w * out_ch * bytes_per_sample;
    if (depth < 8) stride = (size_t)w; /* pre-packing: one byte per pixel */
    unsigned char *out = malloc(stride * h);
    png_bytep *rows = malloc(h * sizeof(png_bytep));
    if (!out || !rows) die("oom");
    for (int r = 0; r < h; r++) rows[r] = out + (size_t)r * stride;

    png_color palette[256];
    int n_pal = 0;
    for (int r = 0; r < h; r++) {
        for (int c = 0; c < w; c++) {
            size_t si = ((size_t)r * w + c) * ncomp;
            unsigned char alpha = (unsigned char)(((r * w + c) * 37 + 11) & 0xFF);
            unsigned char *dst = rows[r];
            if (color == 3) { /* palette: index of unique color */
                int k = 0;
                for (; k < n_pal; k++)
                    if (palette[k].red == pixels[si] &&
                        palette[k].green == pixels[si + 1] &&
                        palette[k].blue == pixels[si + 2])
                        break;
                if (k == n_pal) {
                    if (n_pal == 256) die("more than 256 unique colors");
                    palette[k].red = pixels[si];
                    palette[k].green = pixels[si + 1];
                    palette[k].blue = pixels[si + 2];
                    n_pal++;
                }
                dst[c] = (unsigned char)k;
            } else if (depth < 8) { /* sub-byte gray: pre-shift, libpng packs */
                dst[c] = (unsigned char)(pixels[si] >> (8 - depth));
            } else if (depth == 16) {
                /* v -> (v, v): high==low byte, so endianness is moot and
                 * high-byte reduction recovers v exactly */
                for (int ch = 0; ch < (ncomp == 1 ? 1 : 3); ch++) {
                    dst[(c * out_ch + ch) * 2] = pixels[si + ch];
                    dst[(c * out_ch + ch) * 2 + 1] = pixels[si + ch];
                }
                if (color == 4) { dst[(c * out_ch + 1) * 2] = alpha; dst[(c * out_ch + 1) * 2 + 1] = alpha; }
                if (color == 6) { dst[(c * out_ch + 3) * 2] = alpha; dst[(c * out_ch + 3) * 2 + 1] = alpha; }
            } else {
                for (int ch = 0; ch < (ncomp == 1 ? 1 : 3); ch++)
                    dst[c * out_ch + ch] = pixels[si + ch];
                if (color == 4) dst[c * out_ch + 1] = alpha;
                if (color == 6) dst[c * out_ch + 3] = alpha;
            }
        }
    }
    if (color == 3) png_set_PLTE(png, info, palette, n_pal);
    png_set_rows(png, info, rows);
    int transforms = PNG_TRANSFORM_IDENTITY;
    if (depth < 8) transforms |= PNG_TRANSFORM_PACKING;
    png_write_png(png, info, transforms, NULL);
    png_destroy_write_struct(&png, &info);
    fclose(fo);
    free(pixels);
    free(out);
    free(rows);
}

int main(int argc, char **argv) {
    if (argc >= 4 && strcmp(argv[1], "decode") == 0) {
        decode_cmd(argv[2], argv[3]);
        return 0;
    }
    if (argc >= 7 && strcmp(argv[1], "encode") == 0) {
        encode_cmd(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]), atoi(argv[6]));
        return 0;
    }
    fprintf(stderr,
            "usage: png_shim decode <in.png> <out.ppm>\n"
            "       png_shim encode <in.ppm> <out.png> <color> <depth> <interlace>\n");
    return 1;
}
