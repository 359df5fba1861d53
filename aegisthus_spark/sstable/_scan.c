/* SSTable Data.db cell scanner — the C twin of arrow_decode._scan_into.
 *
 * Byte layout (public Cassandra on-disk format; semantics mirrored from the
 * reference's reader, aegisthus-core SSTableColumnScanner.java:141-167):
 *
 *   row   := u16 key_len | key | [i64 row_size (ic only)]
 *            | i32 ldt | i64 deleted_at | [i32 column_count (ic only)]
 *            | cell* | u16 0x0000 terminator (jb/la)
 *   cell  := u16 name_len | name | u8 flags | per-kind fields | value
 *
 * Output: flat per-cell columns in caller-provided buffers, ready to wrap
 * as Arrow arrays zero-copy. The caller loops: each call fills at most
 * cap_cells cells / cap_bytes of variable data, always stopping at a ROW
 * boundary, and returns where to resume.
 *
 * Return codes:
 *   0 DONE         scanned to `end` (or ran off the terminator cleanly)
 *   1 MORE         capacity reached; resume at out->consumed
 *   2 ROW_TOO_BIG  a single row exceeds the buffer caps; grow and retry
 *   3 CORRUPT      bounds violation; out->n cells (incl. the partial row's
 *                  prefix) are valid, out->rows may have a partial row
 *                  closed with its prefix count
 */

#include <stdint.h>
#include <string.h>

#define DELETION_MASK 0x01
#define EXPIRATION_MASK 0x02
#define COUNTER_MASK 0x04
#define RANGE_TOMBSTONE_MASK 0x10
#define LONG_MIN_SENTINEL ((int64_t)0x8000000000000000LL)

typedef struct {
    int64_t n;         /* cells written */
    int64_t rows;      /* row entries written (row_deleted/row_cells) */
    int64_t consumed;  /* byte offset to resume from */
    int64_t key_bytes; /* bytes used in key_data */
    int64_t name_bytes;
    int64_t max_bytes_used; /* bytes used in max_data (rt max bounds) */
    int64_t val_bytes;
} scan_out;

static inline uint16_t rd_u16(const uint8_t *p) {
    return (uint16_t)((p[0] << 8) | p[1]);
}
static inline int32_t rd_i32(const uint8_t *p) {
    return (int32_t)(((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
                     ((uint32_t)p[2] << 8) | (uint32_t)p[3]);
}
static inline int64_t rd_i64(const uint8_t *p) {
    return (int64_t)(((uint64_t)rd_i32(p) << 32) | (uint32_t)rd_i32(p + 4));
}

int scan_cells(
    const uint8_t *buf, int64_t total, int64_t start, int64_t end,
    int has_rs_cc,
    /* capacities */
    int64_t cap_cells, int64_t cap_bytes,
    /* per-cell outputs (cap_cells entries; offsets need cap_cells+1) */
    uint8_t *key_data, int32_t *key_off,
    uint8_t *name_data, int32_t *name_off, uint8_t *name_valid,
    uint8_t *max_data, int32_t *max_off, uint8_t *max_valid,
    uint8_t *val_data, int32_t *val_off, uint8_t *val_valid,
    int64_t *ts, uint8_t *kind,
    int32_t *ttl, uint8_t *ttl_valid,
    int32_t *ldt, uint8_t *ldt_valid,
    int64_t *tsd, uint8_t *tsd_valid,
    /* per-row outputs (cap_cells entries is always enough) */
    int64_t *row_deleted, int32_t *row_cells,
    scan_out *out)
{
    int64_t o = start;
    int64_t n = 0, rows = 0;
    int64_t kb = 0, nb = 0, mb = 0, vb = 0;
    /* row-start snapshot (function scope: corrupt labels need it too) */
    int64_t row_start = start, n0 = 0, kb0 = 0, nb0 = 0, mb0 = 0, vb0 = 0;
    key_off[0] = 0; name_off[0] = 0; max_off[0] = 0; val_off[0] = 0;

    while (o < end) {
        row_start = o; n0 = n; kb0 = kb; nb0 = nb; mb0 = mb; vb0 = vb;

        /* Per-row arrays (row_deleted/row_cells) hold cap_cells entries and
         * are indexed at `rows` below before any cell-level check runs; a
         * batch of cap_cells single-cell rows leaves rows == cap_cells at
         * the next row's header, so guard BEFORE touching them. */
        if (rows >= cap_cells || n >= cap_cells) {
            o = row_start;
            goto capacity_rewound;
        }

        if (o + 2 > total) goto done;
        uint16_t keysize = rd_u16(buf + o); o += 2;
        if (o + keysize > total) goto corrupt;
        const uint8_t *key = buf + o; o += keysize;

        int64_t row_end = -1;
        if (has_rs_cc) {
            if (o + 8 > total) goto corrupt;
            int64_t row_size = rd_i64(buf + o);
            row_end = o + 8 + row_size;
            o += 8;
            /* a negative or past-the-end size is corruption, not a skip */
            if (row_size < 0 || row_end > total) goto corrupt;
        }
        if (o + 12 > total) goto corrupt;
        int64_t deleted_at = rd_i64(buf + o + 4);
        o += 12;
        int64_t ncols = -1;
        if (has_rs_cc) {
            if (o + 4 > total) goto corrupt;
            ncols = rd_i32(buf + o); o += 4;
            /* ncols == -1 doubles as the jb "until terminator" sentinel in
             * the cell loop below; a negative on-disk count must not alias
             * into it */
            if (ncols < 0) goto corrupt;
        }
        row_deleted[rows] = deleted_at;

        int32_t emitted = 0;
        for (int64_t ci = 0; ncols < 0 || ci < ncols; ci++) {
            if (o + 2 > total) goto corrupt_partial;
            uint16_t name_len = rd_u16(buf + o); o += 2;
            if (name_len == 0) break;
            if (o + name_len + 1 > total) goto corrupt_partial;

            /* capacity check BEFORE writing the cell; worst-case var need */
            if (n + 1 > cap_cells ||
                kb + keysize > cap_bytes || nb + name_len > cap_bytes) {
                goto capacity;
            }
            memcpy(name_data + nb, buf + o, name_len);
            nb += name_len;
            o += name_len;
            uint8_t flags = buf[o]; o += 1;

            int64_t cts; int32_t vlen;
            if (!(flags & (DELETION_MASK | EXPIRATION_MASK | COUNTER_MASK |
                           RANGE_TOMBSTONE_MASK))) {
                if (o + 12 > total) goto corrupt_cell;
                cts = rd_i64(buf + o);
                vlen = rd_i32(buf + o + 8);
                o += 12;
                if (vlen < 0 || o + vlen > total) goto corrupt_cell;
                if (vb + vlen > cap_bytes) goto capacity_cell;
                memcpy(val_data + vb, buf + o, vlen); vb += vlen; o += vlen;
                kind[n] = 'c';
                val_valid[n] = 1; max_valid[n] = 0;
                ttl_valid[n] = 0; ldt_valid[n] = 0; tsd_valid[n] = 0;
            } else if (flags & RANGE_TOMBSTONE_MASK) {
                if (o + 2 > total) goto corrupt_cell;
                uint16_t max_len = rd_u16(buf + o); o += 2;
                if (o + max_len + 12 > total) goto corrupt_cell;
                if (mb + max_len > cap_bytes) goto capacity_cell;
                memcpy(max_data + mb, buf + o, max_len); mb += max_len;
                o += max_len;
                ldt[n] = rd_i32(buf + o);
                cts = rd_i64(buf + o + 4);
                o += 12;
                kind[n] = 't';
                val_valid[n] = 0; max_valid[n] = 1;
                ttl_valid[n] = 0; ldt_valid[n] = 1; tsd_valid[n] = 0;
            } else if (flags & COUNTER_MASK) {
                if (o + 20 > total) goto corrupt_cell;
                tsd[n] = rd_i64(buf + o);
                cts = rd_i64(buf + o + 8);
                vlen = rd_i32(buf + o + 16);
                o += 20;
                if (vlen < 0 || o + vlen > total) goto corrupt_cell;
                if (vb + vlen > cap_bytes) goto capacity_cell;
                memcpy(val_data + vb, buf + o, vlen); vb += vlen; o += vlen;
                kind[n] = 'x';
                val_valid[n] = 1; max_valid[n] = 0;
                ttl_valid[n] = 0; ldt_valid[n] = 0; tsd_valid[n] = 1;
            } else if (flags & EXPIRATION_MASK) {
                if (o + 20 > total) goto corrupt_cell;
                ttl[n] = rd_i32(buf + o);
                ldt[n] = rd_i32(buf + o + 4);
                cts = rd_i64(buf + o + 8);
                vlen = rd_i32(buf + o + 16);
                o += 20;
                if (vlen < 0 || o + vlen > total) goto corrupt_cell;
                if (vb + vlen > cap_bytes) goto capacity_cell;
                memcpy(val_data + vb, buf + o, vlen); vb += vlen; o += vlen;
                kind[n] = 'e';
                val_valid[n] = 1; max_valid[n] = 0;
                ttl_valid[n] = 1; ldt_valid[n] = 1; tsd_valid[n] = 0;
            } else { /* DELETION */
                if (o + 12 > total) goto corrupt_cell;
                cts = rd_i64(buf + o);
                vlen = rd_i32(buf + o + 8);
                o += 12;
                if (vlen < 0 || o + vlen > total) goto corrupt_cell;
                if (vb + vlen > cap_bytes) goto capacity_cell;
                memcpy(val_data + vb, buf + o, vlen); vb += vlen;
                kind[n] = 'd';
                if (vlen == 4) { ldt[n] = rd_i32(buf + o); ldt_valid[n] = 1; }
                else { ldt_valid[n] = 0; }
                o += vlen;
                val_valid[n] = 1; max_valid[n] = 0;
                ttl_valid[n] = 0; tsd_valid[n] = 0;
            }
            memcpy(key_data + kb, key, keysize); kb += keysize;
            ts[n] = cts;
            name_valid[n] = 1;
            n++;
            key_off[n] = (int32_t)kb;
            name_off[n] = (int32_t)nb;
            max_off[n] = (int32_t)mb;
            val_off[n] = (int32_t)vb;
            emitted++;
            continue;

        capacity_cell:
            /* roll back this cell's name write and treat as capacity */
            nb -= name_len;
            o = row_start; /* simplest: rewind whole row */
            goto capacity_rewound;
        corrupt_cell:
            /* name already written but cell incomplete: drop the name */
            nb -= name_len;
            goto corrupt_partial;
        }

        if (emitted == 0) {
            if (n + 1 > cap_cells || kb + keysize > cap_bytes) goto capacity;
            kind[n] = 'r';
            memcpy(key_data + kb, key, keysize); kb += keysize;
            ts[n] = LONG_MIN_SENTINEL;
            name_valid[n] = 0; val_valid[n] = 0; max_valid[n] = 0;
            ttl_valid[n] = 0; ldt_valid[n] = 0; tsd_valid[n] = 0;
            n++;
            key_off[n] = (int32_t)kb;
            name_off[n] = (int32_t)nb;
            max_off[n] = (int32_t)mb;
            val_off[n] = (int32_t)vb;
            emitted = 1;
        }
        row_cells[rows] = emitted;
        rows++;

        if (has_rs_cc && o < row_end) o = row_end;
        continue;

    capacity:
        o = row_start;
    capacity_rewound:
        n = n0; kb = kb0; nb = nb0; mb = mb0; vb = vb0;
        out->n = n; out->rows = rows; out->consumed = o;
        out->key_bytes = kb; out->name_bytes = nb;
        out->max_bytes_used = mb; out->val_bytes = vb;
        return (n == 0) ? 2 /* single row larger than caps */ : 1;
    }

done:
    out->n = n; out->rows = rows; out->consumed = o;
    out->key_bytes = kb; out->name_bytes = nb;
    out->max_bytes_used = mb; out->val_bytes = vb;
    return 0;

corrupt_partial:
    /* keep the partial row's decoded prefix, close its bookkeeping */
    row_cells[rows] = (int32_t)(n - n0);
    rows++;
    out->n = n; out->rows = rows; out->consumed = o;
    out->key_bytes = kb; out->name_bytes = nb;
    out->max_bytes_used = mb; out->val_bytes = vb;
    return 3;

corrupt:
    out->n = n; out->rows = rows; out->consumed = o;
    out->key_bytes = kb; out->name_bytes = nb;
    out->max_bytes_used = mb; out->val_bytes = vb;
    return 3;
}

/* ------------------------------------------------------------------ */
/* LZ4 block decompression (public block format: token byte with
 * literal/match lengths, 2-byte little-endian match offset). Cassandra
 * chunks are raw LZ4 blocks after a 4-byte uncompressed-length prefix.
 * Returns bytes written, or -1 on malformed/overrun input.            */

int64_t lz4_block_decompress(
    const uint8_t *src, int64_t src_len, uint8_t *dst, int64_t dst_len)
{
    int64_t si = 0, di = 0;
    while (si < src_len && di < dst_len) {
        uint8_t token = src[si++];
        int64_t lit = token >> 4;
        if (lit == 15) {
            uint8_t b;
            do {
                if (si >= src_len) return -1;
                b = src[si++];
                lit += b;
            } while (b == 255);
        }
        if (lit) {
            if (si + lit > src_len || di + lit > dst_len) return -1;
            memcpy(dst + di, src + si, lit);
            si += lit;
            di += lit;
        }
        if (si >= src_len) break; /* last literals-only sequence */
        if (si + 2 > src_len) return -1;
        int64_t offset = src[si] | ((int64_t)src[si + 1] << 8);
        si += 2;
        if (offset == 0 || offset > di) return -1;
        int64_t mlen = (token & 0x0F) + 4;
        if ((token & 0x0F) == 15) {
            uint8_t b;
            do {
                if (si >= src_len) return -1;
                b = src[si++];
                mlen += b;
            } while (b == 255);
        }
        if (di + mlen > dst_len) return -1;
        if (offset >= mlen) {
            memcpy(dst + di, dst + di - offset, mlen);
        } else {
            /* overlapping match: byte-at-a-time semantics */
            for (int64_t k = 0; k < mlen; k++) dst[di + k] = dst[di + k - offset];
        }
        di += mlen;
    }
    return di;
}

/* ------------------------------------------------------------------ */
/* Snappy raw-block decompression (public format: varint uncompressed
 * length header, then literal/copy tagged elements). Returns bytes
 * written, or -1 on malformed/overrun input.                          */

int64_t snappy_decompress_block(
    const uint8_t *src, int64_t src_len, uint8_t *dst, int64_t dst_len)
{
    int64_t si = 0, di = 0;
    /* varint header: the uncompressed length (caller already sized dst) */
    uint64_t ulen = 0;
    int shift = 0;
    for (;;) {
        if (si >= src_len || shift > 56) return -1;
        uint8_t b = src[si++];
        ulen |= (uint64_t)(b & 0x7F) << shift;
        if (!(b & 0x80)) break;
        shift += 7;
    }
    if ((int64_t)ulen != dst_len) return -1;

    while (si < src_len) {
        uint8_t tag = src[si++];
        int t = tag & 3;
        if (t == 0) { /* literal */
            int64_t ln = (tag >> 2) + 1;
            if (ln > 60) {
                int extra = (int)(ln - 60);
                if (si + extra > src_len) return -1;
                ln = 0;
                for (int k = 0; k < extra; k++) ln |= (int64_t)src[si + k] << (8 * k);
                ln += 1;
                si += extra;
            }
            if (si + ln > src_len || di + ln > dst_len) return -1;
            memcpy(dst + di, src + si, ln);
            si += ln;
            di += ln;
        } else {
            int64_t ln, off;
            if (t == 1) {
                if (si >= src_len) return -1;
                ln = ((tag >> 2) & 7) + 4;
                off = ((int64_t)(tag >> 5) << 8) | src[si];
                si += 1;
            } else if (t == 2) {
                if (si + 2 > src_len) return -1;
                ln = (tag >> 2) + 1;
                off = src[si] | ((int64_t)src[si + 1] << 8);
                si += 2;
            } else {
                if (si + 4 > src_len) return -1;
                ln = (tag >> 2) + 1;
                off = src[si] | ((int64_t)src[si + 1] << 8) |
                      ((int64_t)src[si + 2] << 16) | ((int64_t)src[si + 3] << 24);
                si += 4;
            }
            if (off == 0 || off > di || di + ln > dst_len) return -1;
            if (off >= ln) {
                memcpy(dst + di, dst + di - off, ln);
            } else {
                for (int64_t k = 0; k < ln; k++) dst[di + k] = dst[di + k - off];
            }
            di += ln;
        }
    }
    return di;
}
