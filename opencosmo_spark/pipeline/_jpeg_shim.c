/* Minimal setjmp-safe libjpeg decode shim.
 *
 * libjpeg's error model is error_exit + longjmp: the default handler
 * calls exit(), and a replacement that merely returns leaves the
 * library in undefined state. Neither is expressible through ctypes
 * (a Python callback cannot longjmp), so this ~60-line shim owns the
 * jmp_buf and exposes one flat, total function:
 *
 *   ocs_jpeg_decode_rgb(data, len, max_pixels, &w, &h) -> RGB8 buffer
 *     (malloc'd, caller frees with ocs_shim_free) or NULL on ANY
 *     structural error, oversize image, or decode failure. Warnings
 *     are swallowed (corrupt-but-recoverable streams still decode,
 *     matching libjpeg's normal tolerant behaviour).
 *
 * Compiled lazily by pipeline/native_codecs.py with the system gcc
 * against the system libjpeg; when either is missing the native tier
 * simply stays unavailable and the pure-python ladder serves alone.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

struct ocs_err_mgr {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
};

static void ocs_error_exit(j_common_ptr cinfo)
{
    struct ocs_err_mgr *err = (struct ocs_err_mgr *) cinfo->err;
    longjmp(err->jb, 1);
}

static void ocs_emit_message(j_common_ptr cinfo, int msg_level)
{
    (void) cinfo;
    (void) msg_level; /* swallow warnings: no stderr spam per row */
}

static void ocs_output_message(j_common_ptr cinfo)
{
    (void) cinfo;
}

unsigned char *ocs_jpeg_decode_rgb(const unsigned char *data,
                                   unsigned long len,
                                   unsigned long max_pixels,
                                   int *out_w, int *out_h)
{
    struct jpeg_decompress_struct cinfo;
    struct ocs_err_mgr jerr;
    unsigned char *buf = NULL;
    JDIMENSION w, h;

    memset(&cinfo, 0, sizeof cinfo);
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = ocs_error_exit;
    jerr.pub.emit_message = ocs_emit_message;
    jerr.pub.output_message = ocs_output_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        free(buf);
        return NULL;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, (unsigned char *) data, len);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return NULL;
    }
    cinfo.out_color_space = JCS_RGB;
    /* pixel-replication chroma upsampling, matching the pure-python
     * decoder (np.repeat) so the cross-tier differential stays tight */
    cinfo.do_fancy_upsampling = FALSE;
    jpeg_start_decompress(&cinfo);
    w = cinfo.output_width;
    h = cinfo.output_height;
    if (w == 0 || h == 0 || cinfo.output_components != 3
        || (unsigned long) w * h > max_pixels) {
        jpeg_destroy_decompress(&cinfo);
        return NULL;
    }
    buf = malloc((size_t) w * h * 3);
    if (buf == NULL) {
        jpeg_destroy_decompress(&cinfo);
        return NULL;
    }
    while (cinfo.output_scanline < h) {
        JSAMPROW row = buf + (size_t) cinfo.output_scanline * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *out_w = (int) w;
    *out_h = (int) h;
    return buf;
}

void ocs_shim_free(void *p)
{
    free(p);
}

/* Test/probe helper: encode RGB8 to JPEG, optionally with arithmetic
 * entropy coding and/or progressive scan scripts. Exists so the
 * arithmetic-decode path (a format the pure tier gates) can be
 * PROVEN against fixtures generated in-container — no external
 * encoder ships here. Returns a malloc'd buffer (ocs_shim_free) or
 * NULL; *out_len receives the byte count. */
unsigned char *ocs_jpeg_encode_rgb(const unsigned char *rgb,
                                   int w, int h, int quality,
                                   int arithmetic, int progressive,
                                   unsigned long *out_len)
{
    struct jpeg_compress_struct cinfo;
    struct ocs_err_mgr jerr;
    unsigned char *buf = NULL;
    unsigned long len = 0;

    memset(&cinfo, 0, sizeof cinfo);
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = ocs_error_exit;
    jerr.pub.emit_message = ocs_emit_message;
    jerr.pub.output_message = ocs_output_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_compress(&cinfo);
        free(buf);
        return NULL;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &buf, &len);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    if (arithmetic)
        cinfo.arith_code = TRUE;
    if (progressive)
        jpeg_simple_progression(&cinfo);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = (JSAMPROW) rgb
            + (size_t) cinfo.next_scanline * w * 3;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    *out_len = len;
    return buf;
}
