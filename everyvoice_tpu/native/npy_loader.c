/* Parallel .npy ingestion for the training data loader.
 *
 * The reference feeds its trainers through torch DataLoader worker
 * *processes* (reference dataloader/__init__.py:80-94); here the host side
 * is a C thread pool instead: no serialization, no fork, and the GIL is
 * released for the whole batch, so file IO and padded-batch assembly
 * overlap with TPU compute.
 *
 * Supports the subset of the .npy format the preprocessor writes:
 * version 1.0/2.0 headers, little-endian '<f4'/'<i4', C order, 1-D or 2-D.
 */

#include <pthread.h>
#include <stdatomic.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define NPY_MAGIC "\x93NUMPY"

typedef struct {
    long rows;       /* first dimension (1 for 1-D arrays of length cols) */
    long cols;       /* product of remaining dimensions */
    int elem_size;   /* 4 for f4/i4 */
    int is_float;    /* 1 for '<f4', 0 for '<i4' */
    long data_offset;
} npy_info;

static int parse_header(FILE *f, npy_info *info) {
    unsigned char preamble[10];
    if (fread(preamble, 1, 8, f) != 8) return -1;
    if (memcmp(preamble, NPY_MAGIC, 6) != 0) return -1;
    int major = preamble[6];
    unsigned long header_len;
    if (major == 1) {
        unsigned char lenb[2];
        if (fread(lenb, 1, 2, f) != 2) return -1;
        header_len = lenb[0] | ((unsigned long)lenb[1] << 8);
        info->data_offset = 10 + (long)header_len;
    } else if (major == 2 || major == 3) {
        unsigned char lenb[4];
        if (fread(lenb, 1, 4, f) != 4) return -1;
        header_len = lenb[0] | ((unsigned long)lenb[1] << 8)
            | ((unsigned long)lenb[2] << 16) | ((unsigned long)lenb[3] << 24);
        info->data_offset = 12 + (long)header_len;
    } else {
        return -1;
    }
    if (header_len > 65536) return -1;
    char *header = malloc(header_len + 1);
    if (!header) return -1;
    if (fread(header, 1, header_len, f) != header_len) {
        free(header);
        return -1;
    }
    header[header_len] = '\0';

    /* A well-formed .npy whose layout we don't read (Fortran order, or any
     * dtype other than '<f4'/'<i4' — e.g. default int64 durations saved by
     * np.save) is -2: "valid file, use the numpy fallback", distinct from
     * the -1 corrupt/missing errors above. */
    if (strstr(header, "'fortran_order': True")) { free(header); return -2; }
    if (strstr(header, "'<f4'")) {
        info->elem_size = 4; info->is_float = 1;
    } else if (strstr(header, "'<i4'")) {
        info->elem_size = 4; info->is_float = 0;
    } else {
        free(header);
        return -2;
    }
    char *shape = strstr(header, "'shape':");
    if (!shape) { free(header); return -1; }
    char *open = strchr(shape, '(');
    if (!open) { free(header); return -1; }
    long dims[4] = {0, 0, 0, 0};
    int ndims = 0;
    char *cursor = open + 1;
    while (ndims < 4) {
        while (*cursor == ' ' || *cursor == ',') cursor++;
        if (*cursor == ')') break;
        char *end;
        long v = strtol(cursor, &end, 10);
        if (end == cursor) break;
        dims[ndims++] = v;
        cursor = end;
    }
    free(header);
    if (ndims == 0) { /* zero-d scalar */
        info->rows = 1; info->cols = 1;
    } else if (ndims == 1) {
        info->rows = 1; info->cols = dims[0];
    } else {
        info->rows = dims[0];
        info->cols = 1;
        for (int i = 1; i < ndims; i++) info->cols *= dims[i];
    }
    return 0;
}

/* Read just the shape/dtype. Returns 0 on success. */
int npy_header(const char *path, long *rows, long *cols, int *is_float) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    npy_info info;
    int rc = parse_header(f, &info);
    fclose(f);
    if (rc != 0) return rc;
    *rows = info.rows;
    *cols = info.cols;
    *is_float = info.is_float;
    return 0;
}

/* Copy up to max_rows x max_cols of the array into dst.
 *
 * dst is row-major with dst_row_stride elements per row (stride >= the
 * copied column count, letting callers write directly into a padded batch
 * slice). transpose=1 reads an (R, C) file into a (C, R)-shaped dst region
 * (used for mel spectrograms stored as (n_mels, T) but batched as
 * (T, n_mels)). Returns rows written to dst, or -1 on error.
 */
long npy_read_into(const char *path, void *dst, long max_rows, long max_cols,
                   long dst_row_stride, int transpose, int expect_float) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    npy_info info;
    int hdr_rc = parse_header(f, &info);
    if (hdr_rc != 0) { fclose(f); return hdr_rc; }
    /* A dtype mismatch must not silently bit-reinterpret values (-2 lets
     * callers distinguish "wrong dtype, use the numpy fallback" from IO
     * failure). */
    if (info.is_float != expect_float) { fclose(f); return -2; }
    if (fseek(f, info.data_offset, SEEK_SET) != 0) { fclose(f); return -1; }

    long src_rows = info.rows, src_cols = info.cols;
    char *out = (char *)dst;
    long written;
    if (!transpose) {
        long rows = src_rows < max_rows ? src_rows : max_rows;
        long cols = src_cols < max_cols ? src_cols : max_cols;
        for (long r = 0; r < rows; r++) {
            if (fseek(f, info.data_offset + r * src_cols * info.elem_size,
                      SEEK_SET) != 0) { fclose(f); return -1; }
            if (fread(out + r * dst_row_stride * info.elem_size,
                      info.elem_size, cols, f) != (size_t)cols) {
                fclose(f);
                return -1;
            }
        }
        written = rows;
    } else {
        /* dst row r <- source column r; dst has src_rows-wide rows */
        long rows = src_cols < max_rows ? src_cols : max_rows;  /* dst rows */
        long cols = src_rows < max_cols ? src_rows : max_cols;  /* dst cols */
        char *buf = malloc((size_t)(src_rows * src_cols) * info.elem_size);
        if (!buf) { fclose(f); return -1; }
        if (fread(buf, info.elem_size, src_rows * src_cols, f)
            != (size_t)(src_rows * src_cols)) {
            free(buf);
            fclose(f);
            return -1;
        }
        for (long r = 0; r < rows; r++) {
            char *drow = out + r * dst_row_stride * info.elem_size;
            for (long c = 0; c < cols; c++) {
                memcpy(drow + c * info.elem_size,
                       buf + (c * src_cols + r) * info.elem_size,
                       info.elem_size);
            }
        }
        free(buf);
        written = rows;
    }
    fclose(f);
    return written;
}

typedef struct {
    const char **paths;
    void **dsts;
    const long *max_rows;
    const long *max_cols;
    const long *dst_strides;
    const int *transposes;
    const int *expect_floats;
    long *rows_out;
    int n;
    atomic_int next;
} many_ctx;

static void *worker(void *arg) {
    many_ctx *ctx = (many_ctx *)arg;
    for (;;) {
        int i = atomic_fetch_add(&ctx->next, 1);
        if (i >= ctx->n) break;
        ctx->rows_out[i] = npy_read_into(
            ctx->paths[i], ctx->dsts[i], ctx->max_rows[i], ctx->max_cols[i],
            ctx->dst_strides[i], ctx->transposes[i], ctx->expect_floats[i]);
    }
    return NULL;
}

/* Fill many destination buffers from many .npy files with a thread pool.
 * rows_out[i] receives the per-file result of npy_read_into. Returns 0. */
int npy_read_many(const char **paths, void **dsts, const long *max_rows,
                  const long *max_cols, const long *dst_strides,
                  const int *transposes, const int *expect_floats,
                  long *rows_out, int n, int n_threads) {
    many_ctx ctx = {paths, dsts, max_rows, max_cols, dst_strides,
                    transposes, expect_floats, rows_out, n, 0};
    if (n_threads > n) n_threads = n;
    if (n_threads < 1) n_threads = 1;
    if (n_threads == 1) {
        worker(&ctx);
        return 0;
    }
    pthread_t threads[64];
    if (n_threads > 64) n_threads = 64;
    for (int t = 0; t < n_threads; t++)
        pthread_create(&threads[t], NULL, worker, &ctx);
    for (int t = 0; t < n_threads; t++)
        pthread_join(threads[t], NULL);
    return 0;
}
