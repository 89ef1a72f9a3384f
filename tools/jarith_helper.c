/* Third-party JPEG oracle helper for the arithmetic-coding decoder
 * (receipt_scanner_spark/extract/jarith.py).
 *
 * Compiled on demand by tools/diff_jpeg_arith_oracle.py and the
 * arithmetic-JPEG tests against the host's system libjpeg
 * (libjpeg62-turbo, which ships both the arithmetic encoder and
 * decoder).  Nothing here ships in the engine — this is test
 * tooling only, in the same spirit as the node-based parser
 * differential oracles (tools/diff_amount_oracle.py).
 *
 * Modes (all stdin -> stdout):
 *   enc <quality> <progressive 0|1> <restart> <arith 0|1>
 *       P5/P6 PGM/PPM in -> JPEG out
 *   dec
 *       JPEG in -> P5 PGM out (libjpeg grayscale conversion)
 *   trans <arith 0|1> <progressive 0|1> <restart>
 *       JPEG in -> JPEG out with IDENTICAL DCT coefficients
 *       (jpeg_read_coefficients / jpeg_write_coefficients), entropy
 *       coding switched between Huffman and arithmetic.  This is the
 *       exact-differential path: decoding the transcoded file must
 *       produce bit-identical pixels to decoding the original.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static int read_pnm_header(FILE *f, int *maxval, int *w, int *h, int *chans) {
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1) return -1;
  if (strcmp(magic, "P5") == 0) *chans = 1;
  else if (strcmp(magic, "P6") == 0) *chans = 3;
  else return -1;
  int vals[3], got = 0;
  while (got < 3) {
    int c = fgetc(f);
    if (c == '#') { while (c != '\n' && c != EOF) c = fgetc(f); continue; }
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r') continue;
    ungetc(c, f);
    if (fscanf(f, "%d", &vals[got]) != 1) return -1;
    got++;
  }
  fgetc(f); /* single whitespace after maxval */
  *w = vals[0]; *h = vals[1]; *maxval = vals[2];
  return 0;
}

static int do_enc(int quality, int progressive, int restart, int arith) {
  int maxval, w, h, chans;
  if (read_pnm_header(stdin, &maxval, &w, &h, &chans) != 0) return 2;
  size_t rowbytes = (size_t)w * chans;
  unsigned char *pix = malloc(rowbytes * h);
  if (!pix || fread(pix, 1, rowbytes * h, stdin) != rowbytes * h) return 2;

  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, stdout);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = chans;
  cinfo.in_color_space = chans == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  cinfo.restart_interval = restart;
  if (progressive) jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = pix + (size_t)cinfo.next_scanline * rowbytes;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  free(pix);
  return 0;
}

static int do_dec(void) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, stdin);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  printf("P5\n%d %d\n255\n", cinfo.output_width, cinfo.output_height);
  unsigned char *row = malloc(cinfo.output_width);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW r = row;
    jpeg_read_scanlines(&cinfo, &r, 1);
    fwrite(row, 1, cinfo.output_width, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  free(row);
  return 0;
}

static void set_multiscan(j_compress_ptr cinfo) {
  /* sequential scan script: one full-band scan per component */
  static jpeg_scan_info scans[MAX_COMPONENTS];
  int i;
  for (i = 0; i < cinfo->num_components; i++) {
    scans[i].comps_in_scan = 1;
    scans[i].component_index[0] = i;
    scans[i].Ss = 0;
    scans[i].Se = 63;
    scans[i].Ah = 0;
    scans[i].Al = 0;
  }
  cinfo->scan_info = scans;
  cinfo->num_scans = cinfo->num_components;
}

/* raw 4-channel (CMYK/YCCK) encode: stdin "RAW4 w h\n" + w*h*4 bytes */
static int do_enc4(int quality, int transform, int progressive) {
  int w, h;
  if (scanf("RAW4 %d %d", &w, &h) != 2) return 2;
  fgetc(stdin);
  size_t rowbytes = (size_t)w * 4;
  unsigned char *pix = malloc(rowbytes * h);
  if (!pix || fread(pix, 1, rowbytes * h, stdin) != rowbytes * h) return 2;
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, stdout);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 4;
  cinfo.in_color_space = JCS_CMYK;
  jpeg_set_defaults(&cinfo);
  jpeg_set_colorspace(&cinfo, transform == 2 ? JCS_YCCK : JCS_CMYK);
  jpeg_set_quality(&cinfo, quality, TRUE);
  if (progressive) jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = pix + (size_t)cinfo.next_scanline * rowbytes;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  free(pix);
  return 0;
}

/* decode any 4-channel JPEG back to raw CMYK (YCCK converted) */
static int do_dec4(void) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, stdin);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_CMYK;
  jpeg_start_decompress(&cinfo);
  printf("RAW4 %d %d\n", cinfo.output_width, cinfo.output_height);
  unsigned char *row = malloc((size_t)cinfo.output_width * 4);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW r = row;
    jpeg_read_scanlines(&cinfo, &r, 1);
    fwrite(row, 1, (size_t)cinfo.output_width * 4, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  free(row);
  return 0;
}

static int do_trans(int arith, int progressive, int restart) {
  struct jpeg_decompress_struct din;
  struct jpeg_compress_struct dout;
  struct jpeg_error_mgr jerr1, jerr2;
  din.err = jpeg_std_error(&jerr1);
  jpeg_create_decompress(&din);
  jpeg_stdio_src(&din, stdin);
  jpeg_read_header(&din, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&din);

  dout.err = jpeg_std_error(&jerr2);
  jpeg_create_compress(&dout);
  jpeg_stdio_dest(&dout, stdout);
  jpeg_copy_critical_parameters(&din, &dout);
  dout.arith_code = arith ? TRUE : FALSE;
  dout.optimize_coding = arith ? FALSE : TRUE;
  dout.restart_interval = restart;
  if (progressive == 1) jpeg_simple_progression(&dout);
  else if (progressive == 2) set_multiscan(&dout);  /* sequential script */
  jpeg_write_coefficients(&dout, coefs);
  jpeg_finish_compress(&dout);
  jpeg_destroy_compress(&dout);
  jpeg_finish_decompress(&din);
  jpeg_destroy_decompress(&din);
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 2) return 2;
  if (strcmp(argv[1], "enc") == 0 && argc == 6)
    return do_enc(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]), atoi(argv[5]));
  if (strcmp(argv[1], "dec") == 0) return do_dec();
  if (strcmp(argv[1], "dec4") == 0) return do_dec4();
  if (strcmp(argv[1], "enc4") == 0 && argc == 5)
    return do_enc4(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]));
  if (strcmp(argv[1], "trans") == 0 && argc == 5)
    return do_trans(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]));
  fprintf(stderr, "usage: jarith_helper enc q prog restart arith | dec |"
                  " trans arith prog restart\n");
  return 2;
}
