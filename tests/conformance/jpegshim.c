/* Test-only conformance shim around the SYSTEM libjpeg (libjpeg-turbo).
 *
 * Compiled on demand by tests/conftest helpers (gcc -O2 jpegshim.c
 * -ljpeg); NEVER linked into the product: libjpeg's fatal-error
 * contract (error_exit) terminates the process, which is exactly why
 * the engine's decode path is pure python/numpy — here the shim runs
 * in a throwaway subprocess per call, so a decoder abort is an
 * ordinary nonzero exit the test harness observes.
 *
 * Modes (argv[1]):
 *   d                          stdin: JPEG  -> stdout: PGM (P5) / PPM (P6)
 *   c                          stdin: JPEG  -> stdout: quantized DCT
 *                              coefficients (entropy-exact, no IDCT):
 *                              "ncomp\n", then per component
 *                              "wblocks hblocks\n" + wb*hb*64 int16 LE
 *                              blocks in raster block order, coefs in
 *                              natural (row) order within each block
 *   e q arith prog rst subs    stdin: PGM/PPM -> stdout: JPEG
 *       q     quality 1..100
 *       arith 1 = arithmetic entropy coding (SOF9/SOF10 + DAC)
 *       prog  1 = progressive (jpeg_simple_progression scan script)
 *       rst   restart interval in MCUs (0 = none)
 *       subs  444 or 420 (3-component input only)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static int read_pnm_header(FILE *f, int *w, int *h, int *nc) {
  int c, maxv, fields = 0, vals[3];
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1) return -1;
  if (!strcmp(magic, "P5")) *nc = 1;
  else if (!strcmp(magic, "P6")) *nc = 3;
  else return -1;
  while (fields < 3) {
    c = fgetc(f);
    if (c == '#') { while ((c = fgetc(f)) != '\n' && c != EOF) {} }
    else if (c >= '0' && c <= '9') {
      ungetc(c, f);
      if (fscanf(f, "%d", &vals[fields++]) != 1) return -1;
    } else if (c == EOF) return -1;
  }
  fgetc(f); /* single whitespace after maxval */
  *w = vals[0]; *h = vals[1]; maxv = vals[2];
  return maxv == 255 ? 0 : -1;
}

static int do_decode(void) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  JSAMPROW row;
  cinfo.err = jpeg_std_error(&jerr); /* default error_exit -> exit(1) */
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, stdin);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) return 1;
  jpeg_start_decompress(&cinfo);
  printf("P%c\n%u %u\n255\n", cinfo.output_components == 1 ? '5' : '6',
         cinfo.output_width, cinfo.output_height);
  row = malloc((size_t)cinfo.output_width * cinfo.output_components);
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, &row, 1);
    fwrite(row, 1, (size_t)cinfo.output_width * cinfo.output_components,
           stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  free(row);
  return 0;
}

static int do_coefs(void) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  jvirt_barray_ptr *coefs;
  int ci;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, stdin);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) return 1;
  coefs = jpeg_read_coefficients(&cinfo);
  if (!coefs) return 1;
  printf("%d\n", cinfo.num_components);
  for (ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = cinfo.comp_info + ci;
    JDIMENSION wb = comp->width_in_blocks, hb = comp->height_in_blocks;
    JDIMENSION by;
    printf("%u %u\n", wb, hb);
    for (by = 0; by < hb; by++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)
        ((j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
      fwrite(rows[0], sizeof(JCOEF), (size_t)wb * DCTSIZE2, stdout);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

static int do_encode(int q, int arith, int prog, int rst, int subs) {
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  JSAMPROW row;
  int w, h, nc;
  unsigned char *buf;
  size_t stride;
  if (read_pnm_header(stdin, &w, &h, &nc)) return 1;
  stride = (size_t)w * nc;
  buf = malloc(stride * h);
  if (fread(buf, 1, stride * h, stdin) != stride * h) return 1;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, stdout);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = nc;
  cinfo.in_color_space = nc == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, q, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  cinfo.restart_interval = rst;
  if (prog) jpeg_simple_progression(&cinfo);
  if (nc == 3 && subs == 444) {
    int ci;
    for (ci = 0; ci < 3; ci++) {
      cinfo.comp_info[ci].h_samp_factor = 1;
      cinfo.comp_info[ci].v_samp_factor = 1;
    }
  }
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    row = buf + stride * cinfo.next_scanline;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  free(buf);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 2 && !strcmp(argv[1], "d")) return do_decode();
  if (argc >= 2 && !strcmp(argv[1], "c")) return do_coefs();
  if (argc >= 7 && !strcmp(argv[1], "e"))
    return do_encode(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                     atoi(argv[5]), atoi(argv[6]));
  fprintf(stderr, "usage: jpegshim d | e q arith prog rst subs\n");
  return 2;
}
