/* corrie_spark native image-codec shim: a thin, error-capturing C
 * wrapper around the system libjpeg / libpng, compiled lazily by
 * sources/native_image.py (gcc is probed at runtime; absence of a
 * compiler or the headers simply disables the fast path — the
 * from-spec pure-python decoders in operators/jpeg.py and
 * operators/multimodal.py remain the always-available fallback and
 * the differential twins).
 *
 * Why a compiled shim instead of pure ctypes (the zstd/brotli
 * pattern): libjpeg's error contract is an `error_exit` callback
 * that MUST NOT return — the library state is undefined if it does,
 * and the default handler calls exit(). A ctypes callback cannot
 * longjmp (setjmp needs a live C frame), so poison input would
 * either kill the Python worker or run libjpeg past a fatal error.
 * The shim owns the setjmp/longjmp pair, so every libjpeg/libpng
 * fatal error surfaces as an ordinary return code + message, and the
 * Python caller falls back to the pure decoder (which raises the
 * house-typed error the DLQ accounting keys on).
 *
 * Return codes (shared by both decoders):
 *   0  decoded; *w/*h/*channels and out[0..*need) valid
 *   1  outside the pure decoders' support envelope — the caller
 *      falls back SILENTLY so native-on vs native-off environments
 *      agree on which inputs decode
 *   2  decode error (message in err); caller falls back to pure,
 *      which raises the typed error
 *   3  out buffer too small; *need holds the required size
 *
 * Determinism stance (documented in SCALE.md and the callers):
 * JPEG decode has no bit-exact cross-decoder ground truth — ITU-T
 * T.81 Annex A conformance is tolerance-based, and libjpeg's scaled
 * integer IDCT differs from the from-spec float IDCT by <=1 LSB on
 * AC-bearing blocks. On the DC-only fixture class every oracle gate
 * uses, the two agree bit-exactly (pinned by tests). Color
 * conversion and chroma upsampling are kept OUT of libjpeg
 * (JCS_YCbCr output + do_fancy_upsampling=FALSE) so the Python side
 * applies the codec's exact double-precision YCbCr->RGB and
 * pixel-replication rules, which removes those two divergence
 * sources entirely.  PNG is lossless: native == pure bit-exact on
 * the full supported envelope.
 */

#include <setjmp.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <jpeglib.h>
#include <png.h>

#define SHIM_VERSION "1"

const char *corrie_image_shim_version(void) { return SHIM_VERSION; }

static void set_err(char *err, int32_t errcap, const char *msg) {
    if (err && errcap > 0) {
        strncpy(err, msg, (size_t)errcap - 1);
        err[errcap - 1] = '\0';
    }
}

/* ----------------------------------------------------------------- jpeg -- */

struct cj_err_mgr {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
    char msg[JMSG_LENGTH_MAX];
};

static void cj_error_exit(j_common_ptr cinfo) {
    struct cj_err_mgr *e = (struct cj_err_mgr *)cinfo->err;
    (*cinfo->err->format_message)(cinfo, e->msg);
    longjmp(e->jb, 1);
}

static void cj_output_message(j_common_ptr cinfo) { (void)cinfo; }

int corrie_jpeg_decode(const uint8_t *buf, size_t len, uint8_t *out,
                       size_t cap, size_t *need, int32_t *w, int32_t *h,
                       int32_t *ch, char *err, int32_t errcap) {
    struct jpeg_decompress_struct ci;
    struct cj_err_mgr jerr;
    int i, hmax, vmax;

    memset(&ci, 0, sizeof(ci));
    ci.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = cj_error_exit;
    jerr.pub.output_message = cj_output_message;
    jerr.msg[0] = '\0';
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&ci);
        set_err(err, errcap, jerr.msg);
        return 2;
    }
    jpeg_create_decompress(&ci);
    jpeg_mem_src(&ci, (const unsigned char *)buf, (unsigned long)len);
    jpeg_read_header(&ci, TRUE);

    /* pure-envelope gate: operators/jpeg.py decodes 8-bit huffman
     * 1- or 3-component frames with integer chroma ratios; anything
     * else must take the pure path so the DLQ verdict is identical
     * in native-on and native-off environments */
    if (ci.data_precision != 8 ||
        (ci.num_components != 1 && ci.num_components != 3 &&
         ci.num_components != 4) ||
        ci.arith_code) {
        jpeg_destroy_decompress(&ci);
        return 1;
    }
    hmax = vmax = 1;
    for (i = 0; i < ci.num_components; i++) {
        if (ci.comp_info[i].h_samp_factor > hmax)
            hmax = ci.comp_info[i].h_samp_factor;
        if (ci.comp_info[i].v_samp_factor > vmax)
            vmax = ci.comp_info[i].v_samp_factor;
    }
    for (i = 0; i < ci.num_components; i++) {
        if (hmax % ci.comp_info[i].h_samp_factor ||
            vmax % ci.comp_info[i].v_samp_factor) {
            jpeg_destroy_decompress(&ci);
            return 1;
        }
    }

    /* keep color conversion and upsampling rules on the Python side:
     * gray stays gray; 3-comp color comes out as replicated-upsampled
     * interleaved YCbCr; 4-comp Adobe comes out RAW (YCCK or CMYK as
     * stored — out == jpeg colorspace is libjpeg's null conversion)
     * for the caller's exact double-precision conversions */
    ci.out_color_space =
        ci.num_components == 1 ? JCS_GRAYSCALE
        : ci.num_components == 4 ? ci.jpeg_color_space
                                 : JCS_YCbCr;
    ci.do_fancy_upsampling = FALSE;
    ci.dct_method = JDCT_ISLOW;
    jpeg_start_decompress(&ci);

    *w = (int32_t)ci.output_width;
    *h = (int32_t)ci.output_height;
    *ch = (int32_t)ci.output_components;
    *need = (size_t)ci.output_width * ci.output_height *
            (size_t)ci.output_components;
    if (cap < *need) {
        jpeg_destroy_decompress(&ci);
        return 3;
    }
    {
        size_t stride = (size_t)ci.output_width * ci.output_components;
        while (ci.output_scanline < ci.output_height) {
            JSAMPROW row = (JSAMPROW)(out + stride * ci.output_scanline);
            jpeg_read_scanlines(&ci, &row, 1);
        }
    }
    jpeg_finish_decompress(&ci);
    /* the pure decoder RAISES on corrupt entropy data; libjpeg warns
     * and zero-pads — treat any warning as a decode failure so both
     * environments DLQ the same inputs */
    if (ci.err->num_warnings > 0) {
        jpeg_destroy_decompress(&ci);
        set_err(err, errcap, "corrupt JPEG data (decode warnings)");
        return 2;
    }
    jpeg_destroy_decompress(&ci);
    return 0;
}

/* ------------------------------------------------------------------ png -- */

struct cp_read {
    const uint8_t *data;
    size_t len, pos;
};

struct cp_err {
    jmp_buf jb;
    char msg[256];
};

static void cp_error_fn(png_structp p, png_const_charp msg) {
    struct cp_err *e = (struct cp_err *)png_get_error_ptr(p);
    strncpy(e->msg, msg, sizeof(e->msg) - 1);
    e->msg[sizeof(e->msg) - 1] = '\0';
    longjmp(e->jb, 1);
}

static void cp_warn_fn(png_structp p, png_const_charp msg) {
    (void)p;
    (void)msg;
}

static void cp_read_fn(png_structp p, png_bytep out, png_size_t n) {
    struct cp_read *r = (struct cp_read *)png_get_io_ptr(p);
    if (r->pos + n > r->len)
        png_error(p, "truncated PNG stream");
    memcpy(out, r->data + r->pos, n);
    r->pos += n;
}

int corrie_png_decode(const uint8_t *buf, size_t len, uint8_t *out,
                      size_t cap, size_t *need, int32_t *w, int32_t *h,
                      int32_t *ch, char *err, int32_t errcap) {
    png_structp png = NULL;
    png_infop info = NULL;
    struct cp_read rd = {buf, len, 0};
    struct cp_err es;
    png_uint_32 iw, ih, y;
    int depth, color, passes;
    size_t rowbytes;
    png_bytep *volatile rows_heap = NULL; /* freed on the longjmp path */

    es.msg[0] = '\0';
    png = png_create_read_struct(PNG_LIBPNG_VER_STRING, &es, cp_error_fn,
                                 cp_warn_fn);
    if (!png) {
        set_err(err, errcap, "png_create_read_struct failed");
        return 2;
    }
    info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, NULL, NULL);
        set_err(err, errcap, "png_create_info_struct failed");
        return 2;
    }
    if (setjmp(es.jb)) {
        free((void *)rows_heap);
        png_destroy_read_struct(&png, &info, NULL);
        set_err(err, errcap, es.msg);
        return 2;
    }
    png_set_read_fn(png, &rd, cp_read_fn);
    /* the pure decoder verifies EVERY chunk CRC — make ancillary CRC
     * failures fatal here too so the poison verdicts agree */
    png_set_crc_action(png, PNG_CRC_ERROR_QUIT, PNG_CRC_ERROR_QUIT);
    png_read_info(png, info);
    png_get_IHDR(png, info, &iw, &ih, &depth, &color, NULL, NULL, NULL);
    /* pure envelope: 8-bit; 16-bit non-palette (MSB kept —
     * png_set_strip_16 chops the low byte, exactly the pure
     * decoder's rule); 1/2/4-bit grey (expand_gray scales by the
     * same 255/(2^d-1) replication) and palette (palette_to_rgb
     * unpacks any index depth) */
    if (depth != 8 &&
        !(depth == 16 && color != PNG_COLOR_TYPE_PALETTE) &&
        !(depth < 8 && (color == PNG_COLOR_TYPE_GRAY ||
                        color == PNG_COLOR_TYPE_PALETTE))) {
        png_destroy_read_struct(&png, &info, NULL);
        return 1;
    }
    if (depth == 16)
        png_set_strip_16(png);
    if (depth < 8 && color == PNG_COLOR_TYPE_GRAY)
        png_set_expand_gray_1_2_4_to_8(png);
    if (color == PNG_COLOR_TYPE_PALETTE)
        png_set_palette_to_rgb(png);
    /* the pure decoder ignores tRNS (no alpha synthesis) and strips
     * any true alpha channel after unfiltering */
    if (color & PNG_COLOR_MASK_ALPHA ||
        png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_strip_alpha(png);
    passes = png_set_interlace_handling(png);
    (void)passes;
    png_read_update_info(png, info);
    rowbytes = png_get_rowbytes(png, info);
    *w = (int32_t)iw;
    *h = (int32_t)ih;
    *ch = (int32_t)(rowbytes / iw);
    *need = rowbytes * ih;
    if (cap < *need) {
        png_destroy_read_struct(&png, &info, NULL);
        return 3;
    }
    {
        /* interlaced images need all rows addressable per pass, so
         * png_read_image takes a full row-pointer table; small images
         * use the stack, tall ones a heap table freed on both paths */
        png_bytep stack_rows[512];
        png_bytep *rows = stack_rows;
        if (ih > 512) {
            rows_heap = (png_bytep *)malloc(ih * sizeof(png_bytep));
            if (!rows_heap) {
                png_destroy_read_struct(&png, &info, NULL);
                set_err(err, errcap, "row table allocation failed");
                return 2;
            }
            rows = rows_heap;
        }
        for (y = 0; y < ih; y++)
            rows[y] = (png_bytep)(out + rowbytes * y);
        png_read_image(png, rows);
        free((void *)rows_heap);
        rows_heap = NULL;
    }
    png_read_end(png, NULL);
    png_destroy_read_struct(&png, &info, NULL);
    return 0;
}

/* ------------------------------------------------------------- gif lzw -- */
/* From-spec GIF89a variable-width LZW decode (the pure decoder's
 * exact semantics, including the one-early width bump, the K-K-K
 * case, and the nominal table length that keeps counting past 4096
 * even though 12-bit codes can never reference those slots). No
 * giflib involvement: the container walk stays in Python; only the
 * per-pixel hot loop moves to C, so there is no foreign-ABI risk in
 * an environment that ships libgif.so without headers.
 *
 * Return codes: 0 ok (*out malloc'd, caller frees via
 * corrie_buf_free); 1 unsupported (mcs outside 1..8 — the pure
 * path's own byte-table limit); 2 corrupt stream.
 */

void corrie_buf_free(uint8_t *p) { free(p); }

int corrie_gif_lzw(const uint8_t *data, size_t len, int32_t mcs,
                   uint8_t **out, size_t *outlen, char *err,
                   int32_t errcap) {
    uint16_t prefix[4096];
    uint8_t suffix[4096];
    uint8_t firstb[4096];
    uint8_t stack[4100];
    int clear, end_code, width, prev, nominal;
    uint32_t acc = 0;
    int nacc = 0;
    size_t di = 0, ocap = 1 << 16, olen = 0;
    uint8_t *obuf;

    *out = NULL;
    *outlen = 0;
    if (mcs < 1 || mcs > 8)
        return 1;
    clear = 1 << mcs;
    end_code = clear + 1;
    for (int i = 0; i < clear; i++) {
        prefix[i] = 0xFFFF;
        suffix[i] = (uint8_t)i;
        firstb[i] = (uint8_t)i;
    }
    nominal = clear + 2;
    width = mcs + 1;
    prev = -1;
    obuf = (uint8_t *)malloc(ocap);
    if (!obuf) {
        set_err(err, errcap, "lzw: out of memory");
        return 2;
    }
    for (;;) {
        int c;
        while (nacc < width) {
            if (di >= len)
                goto done; /* python: next_code() -> None ends */
            acc |= (uint32_t)data[di++] << nacc;
            nacc += 8;
        }
        c = (int)(acc & ((1u << width) - 1));
        acc >>= width;
        nacc -= width;
        if (c == end_code)
            break;
        if (c == clear) {
            nominal = clear + 2;
            width = mcs + 1;
            prev = -1;
            continue;
        }
        {
            int sp = 0, walk, emit_code;
            uint8_t kkk_first = 0;
            int is_kkk = 0;
            if (prev < 0) {
                if (c >= nominal) {
                    free(obuf);
                    set_err(err, errcap, "bad first LZW code");
                    return 2;
                }
                emit_code = c;
            } else if (c < nominal) {
                emit_code = c;
            } else if (c == nominal) { /* K-K-K */
                is_kkk = 1;
                emit_code = prev;
                kkk_first = firstb[prev];
            } else {
                free(obuf);
                set_err(err, errcap, "LZW code out of range");
                return 2;
            }
            if (emit_code >= 4096 || (c < nominal && c >= 4096)) {
                /* codes past 4096 are unreachable at 12-bit width;
                 * nominal > 4096 entries were never stored */
                free(obuf);
                set_err(err, errcap, "LZW code out of range");
                return 2;
            }
            /* unwind the chain into the stack */
            if (is_kkk)
                stack[sp++] = kkk_first;
            walk = emit_code;
            while (walk >= 0 && sp < (int)sizeof(stack)) {
                stack[sp++] = suffix[walk];
                walk = (walk < clear || prefix[walk] == 0xFFFF)
                           ? -1
                           : (int)prefix[walk];
            }
            if (sp >= (int)sizeof(stack)) {
                free(obuf);
                set_err(err, errcap, "LZW chain overflow");
                return 2;
            }
            if (olen + (size_t)sp > ocap) {
                while (olen + (size_t)sp > ocap)
                    ocap <<= 1;
                uint8_t *nb = (uint8_t *)realloc(obuf, ocap);
                if (!nb) {
                    free(obuf);
                    set_err(err, errcap, "lzw: out of memory");
                    return 2;
                }
                obuf = nb;
            }
            for (int i = sp - 1; i >= 0; i--)
                obuf[olen++] = stack[i];
            /* table append (python appends for every non-first code;
             * slots past 4095 are nominal-only) */
            if (prev >= 0) {
                if (nominal < 4096) {
                    prefix[nominal] = (uint16_t)prev;
                    /* new entry = prev + first byte of (entry c |
                     * prev for K-K-K); it starts with prev's bytes */
                    suffix[nominal] =
                        is_kkk ? firstb[prev] : firstb[c];
                    firstb[nominal] = firstb[prev];
                }
                nominal++;
            }
            /* width bump one entry EARLY, python's exact rule */
            if (nominal == (1 << width) - 1 && width < 12)
                width++;
            prev = is_kkk ? nominal - 1 : c;
            if (is_kkk && nominal - 1 >= 4096) {
                /* the K-K-K entry itself landed past the storable
                 * range; it can never be referenced again at 12-bit
                 * width, but prev must still behave like it — remap
                 * prev to the chain we just emitted is impossible,
                 * so fall back to an error (python would keep the
                 * bytes; unreachable in valid streams) */
                free(obuf);
                set_err(err, errcap, "LZW table overflow");
                return 2;
            }
        }
    }
done:
    *out = obuf;
    *outlen = olen;
    return 0;
}
