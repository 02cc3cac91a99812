/* Fast WAV (RIFF/WAVE) reader/writer for the data-loading hot path.
 *
 * The Python `wave` module parses chunk-by-chunk with per-call overhead;
 * this reads the whole file with one read(2) and scans chunks in memory.
 * Called through ctypes, so every call releases the GIL — a host thread
 * pool gets true parallel decode while the TPU computes.
 *
 * Supported: PCM 16-bit (primary corpus format, the framework writes it),
 * PCM 24/32-bit and IEEE float32 (converted to int16 range by the caller
 * via the _f32 entry point). All little-endian.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define WAV_OK 0
#define WAV_ERR_OPEN -1
#define WAV_ERR_FORMAT -2
#define WAV_ERR_UNSUPPORTED -3
#define WAV_ERR_CAPACITY -4

typedef struct {
    uint16_t format;      /* 1 = PCM, 3 = IEEE float */
    uint16_t channels;
    uint32_t sample_rate;
    uint16_t bits;
    long data_offset;
    long data_size;
} wav_header;

static int parse_header(const unsigned char *buf, long size, wav_header *h) {
    if (size < 44 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
        return WAV_ERR_FORMAT;
    long pos = 12;
    int have_fmt = 0;
    h->data_offset = -1;
    while (pos + 8 <= size) {
        const unsigned char *chunk = buf + pos;
        uint32_t chunk_size;
        memcpy(&chunk_size, chunk + 4, 4);
        if (memcmp(chunk, "fmt ", 4) == 0 && chunk_size >= 16) {
            memcpy(&h->format, chunk + 8, 2);
            memcpy(&h->channels, chunk + 10, 2);
            memcpy(&h->sample_rate, chunk + 12, 4);
            memcpy(&h->bits, chunk + 22, 2);
            /* WAVE_FORMAT_EXTENSIBLE: real format in the extension */
            if (h->format == 0xFFFE && chunk_size >= 40)
                memcpy(&h->format, chunk + 32, 2);
            have_fmt = 1;
        } else if (memcmp(chunk, "data", 4) == 0) {
            h->data_offset = pos + 8;
            h->data_size = chunk_size;
            if (h->data_offset + h->data_size > size)
                h->data_size = size - h->data_offset;
        }
        pos += 8 + chunk_size + (chunk_size & 1);
    }
    if (!have_fmt || h->data_offset < 0) return WAV_ERR_FORMAT;
    return WAV_OK;
}

static unsigned char *read_file(const char *path, long *out_size) {
    FILE *f = fopen(path, "rb");
    if (!f) return NULL;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    unsigned char *buf = (unsigned char *)malloc(size > 0 ? size : 1);
    if (!buf) { fclose(f); return NULL; }
    if (fread(buf, 1, size, f) != (size_t)size) {
        free(buf); fclose(f); return NULL;
    }
    fclose(f);
    *out_size = size;
    return buf;
}

/* Header probe: fills channels/sample_rate/bits/format/frames. */
int wav_info(const char *path, int *channels, int *sample_rate, int *bits,
             int *format, long *frames) {
    long size;
    unsigned char *buf = read_file(path, &size);
    if (!buf) return WAV_ERR_OPEN;
    wav_header h;
    int rc = parse_header(buf, size, &h);
    if (rc == WAV_OK) {
        *channels = h.channels;
        *sample_rate = h.sample_rate;
        *bits = h.bits;
        *format = h.format;
        long bytes_per_frame = (long)h.channels * (h.bits / 8);
        *frames = bytes_per_frame > 0 ? h.data_size / bytes_per_frame : 0;
    }
    free(buf);
    return rc;
}

/* Read + convert to float32 in [-1, 1], interleaved. `capacity` is the
 * number of float samples `out` can hold. Returns samples written or a
 * negative error. */
long wav_read_f32(const char *path, float *out, long capacity) {
    long size;
    unsigned char *buf = read_file(path, &size);
    if (!buf) return WAV_ERR_OPEN;
    wav_header h;
    int rc = parse_header(buf, size, &h);
    if (rc != WAV_OK) { free(buf); return rc; }
    const unsigned char *data = buf + h.data_offset;
    long n = 0;
    if (h.format == 1 && h.bits == 16) {
        n = h.data_size / 2;
        if (n > capacity) { free(buf); return WAV_ERR_CAPACITY; }
        const int16_t *src = (const int16_t *)data;
        const float scale = 1.0f / 32768.0f;
        for (long i = 0; i < n; i++) out[i] = src[i] * scale;
    } else if (h.format == 1 && h.bits == 24) {
        n = h.data_size / 3;
        if (n > capacity) { free(buf); return WAV_ERR_CAPACITY; }
        const float scale = 1.0f / 8388608.0f;
        for (long i = 0; i < n; i++) {
            int32_t v = (int32_t)data[3 * i] | ((int32_t)data[3 * i + 1] << 8)
                        | ((int32_t)data[3 * i + 2] << 16);
            if (v >= (1 << 23)) v -= (1 << 24);
            out[i] = v * scale;
        }
    } else if (h.format == 1 && h.bits == 32) {
        n = h.data_size / 4;
        if (n > capacity) { free(buf); return WAV_ERR_CAPACITY; }
        const int32_t *src = (const int32_t *)data;
        const float scale = 1.0f / 2147483648.0f;
        for (long i = 0; i < n; i++) out[i] = src[i] * scale;
    } else if (h.format == 3 && h.bits == 32) {
        n = h.data_size / 4;
        if (n > capacity) { free(buf); return WAV_ERR_CAPACITY; }
        memcpy(out, data, (size_t)n * 4);
    } else {
        free(buf);
        return WAV_ERR_UNSUPPORTED;
    }
    free(buf);
    return n;
}

/* Write interleaved float32 in [-1, 1] as 16-bit PCM. */
int wav_write_i16(const char *path, const float *data, long n_samples,
                  int channels, int sample_rate) {
    FILE *f = fopen(path, "wb");
    if (!f) return WAV_ERR_OPEN;
    uint32_t data_size = (uint32_t)(n_samples * 2);
    uint32_t riff_size = 36 + data_size;
    uint16_t fmt = 1, bits = 16, ch = (uint16_t)channels;
    uint32_t sr = (uint32_t)sample_rate;
    uint32_t byte_rate = sr * ch * 2;
    uint16_t block_align = ch * 2;
    uint32_t fmt_size = 16;
    fwrite("RIFF", 1, 4, f); fwrite(&riff_size, 4, 1, f);
    fwrite("WAVE", 1, 4, f);
    fwrite("fmt ", 1, 4, f); fwrite(&fmt_size, 4, 1, f);
    fwrite(&fmt, 2, 1, f); fwrite(&ch, 2, 1, f);
    fwrite(&sr, 4, 1, f); fwrite(&byte_rate, 4, 1, f);
    fwrite(&block_align, 2, 1, f); fwrite(&bits, 2, 1, f);
    fwrite("data", 1, 4, f); fwrite(&data_size, 4, 1, f);
    /* Convert in 64k blocks to bound stack usage. */
    enum { BLOCK = 65536 };
    int16_t tmp[BLOCK];
    long written = 0;
    while (written < n_samples) {
        long count = n_samples - written;
        if (count > BLOCK) count = BLOCK;
        for (long i = 0; i < count; i++) {
            float v = data[written + i];
            if (v > 1.0f) v = 1.0f;
            if (v < -1.0f) v = -1.0f;
            float scaled = v * 32767.0f;
            tmp[i] = (int16_t)(scaled >= 0 ? scaled + 0.5f : scaled - 0.5f);
        }
        fwrite(tmp, 2, (size_t)count, f);
        written += count;
    }
    fclose(f);
    return WAV_OK;
}
