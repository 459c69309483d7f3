/* Minimal libjpeg CLI shim for the arithmetic-JPEG interop tests
 * (tests/test_jpeg_interop.py). Compiled at test time with
 *     gcc -O2 -o jpeg_shim jpeg_interop.c -ljpeg
 * against the system libjpeg(-turbo), which must be built with
 * C_ARITH_CODING_SUPPORTED / D_ARITH_CODING_SUPPORTED.
 *
 * Usage:
 *   jpeg_shim decode <in.jpg> <out.ppm>
 *       any JPEG (huffman or arithmetic, sequential or progressive)
 *       -> binary PPM (P6 for color, P5 for grayscale)
 *   jpeg_shim encode <in.ppm> <out.jpg> <quality> <arith 0|1>
 *                    <progressive 0|1> <samp 1|2> <restart_mcus>
 *       P6/P5 PPM -> JPEG; samp=2 selects 4:2:0, samp=1 4:4:4
 *       (ignored for grayscale); restart_mcus=0 disables DRI.
 *
 * The default libjpeg error handler prints to stderr and exits
 * non-zero, which is exactly the failure signal the tests want.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *msg) {
    fprintf(stderr, "jpeg_shim: %s\n", msg);
    exit(2);
}

static void decode_cmd(const char *in_path, const char *out_path) {
    FILE *fi = fopen(in_path, "rb");
    if (!fi) die("cannot open input jpeg");
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, fi);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) die("bad header");
    jpeg_start_decompress(&cinfo);

    FILE *fo = fopen(out_path, "wb");
    if (!fo) die("cannot open output ppm");
    fprintf(fo, "P%d\n%u %u\n255\n",
            cinfo.output_components == 1 ? 5 : 6,
            cinfo.output_width, cinfo.output_height);
    size_t stride = (size_t)cinfo.output_width * cinfo.output_components;
    JSAMPROW row = malloc(stride);
    if (!row) die("oom");
    while (cinfo.output_scanline < cinfo.output_height) {
        jpeg_read_scanlines(&cinfo, &row, 1);
        if (fwrite(row, 1, stride, fo) != stride) die("short write");
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    free(row);
    fclose(fi);
    fclose(fo);
}

/* Parse exactly the PPM shape the python test writes:
 * "P6\n<w> <h>\n255\n" + raw bytes (or P5 for grayscale). */
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

static void encode_cmd(const char *in_path, const char *out_path, int quality,
                       int arith, int progressive, int samp, int restart) {
    int w, h, ncomp;
    unsigned char *pixels = read_ppm(in_path, &w, &h, &ncomp);

    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    FILE *fo = fopen(out_path, "wb");
    if (!fo) die("cannot open output jpeg");
    jpeg_stdio_dest(&cinfo, fo);

    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ncomp;
    cinfo.in_color_space = ncomp == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = arith ? TRUE : FALSE;
    if (ncomp == 3) {
        cinfo.comp_info[0].h_samp_factor = samp;
        cinfo.comp_info[0].v_samp_factor = samp;
        cinfo.comp_info[1].h_samp_factor = 1;
        cinfo.comp_info[1].v_samp_factor = 1;
        cinfo.comp_info[2].h_samp_factor = 1;
        cinfo.comp_info[2].v_samp_factor = 1;
    }
    if (progressive) jpeg_simple_progression(&cinfo);
    cinfo.restart_interval = restart;

    jpeg_start_compress(&cinfo, TRUE);
    size_t stride = (size_t)w * ncomp;
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = pixels + cinfo.next_scanline * stride;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    fclose(fo);
    free(pixels);
}

int main(int argc, char **argv) {
    if (argc >= 4 && strcmp(argv[1], "decode") == 0) {
        decode_cmd(argv[2], argv[3]);
        return 0;
    }
    if (argc >= 9 && strcmp(argv[1], "encode") == 0) {
        encode_cmd(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]),
                   atoi(argv[6]), atoi(argv[7]), atoi(argv[8]));
        return 0;
    }
    fprintf(stderr,
            "usage: jpeg_shim decode <in.jpg> <out.ppm>\n"
            "       jpeg_shim encode <in.ppm> <out.jpg> <q> <arith> "
            "<progressive> <samp> <restart>\n");
    return 1;
}
