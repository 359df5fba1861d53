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
/* clamp a local-deletion-time into the canonical int32 schema: only 5.0
 * ("oa") inputs can exceed Integer.MAX_VALUE (CASSANDRA-14227 extends
 * deletions to 2106); the Python twin saturates identically (_sat_ldt) —
 * ldt is gc-grace/rendering metadata, LWW decides on ts/mfda. */
static inline int32_t ma_sat_ldt(int64_t v) {
    return v > 2147483647LL ? 2147483647 : (int32_t)v;
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

/* ------------------------------------------------------------------ */
/* Cassandra 3.x "ma" big-format scanner — C twin of
 * modern.scan_data_buffer_rows_modern (same public on-disk format:
 * UnfilteredSerializer / ClusteringPrefix / VIntCoding, and the same
 * 2.x composite-name output mapping; see modern.py for the layout).
 *
 * Capacity granularity is the PARTITION: on buffer exhaustion the whole
 * partition rewinds and the caller resumes (or doubles buffers on
 * rc=2). rc=4 (UNSUPPORTED) flags shapes this scanner doesn't do
 * (>=64-column subsets, RT nesting deeper than 16, scratch overflow) —
 * the Python wrapper falls back to the pure-Python decoder for the
 * split, so rc=4 is a performance path choice, never a wrong answer.
 */

#define MA_END_OF_PARTITION 0x01
#define MA_IS_MARKER 0x02
#define MA_HAS_TIMESTAMP 0x04
#define MA_HAS_TTL 0x08
#define MA_HAS_DELETION 0x10
#define MA_HAS_ALL_COLUMNS 0x20
#define MA_HAS_COMPLEX_DELETION 0x40
#define MA_EXTENSION_FLAG 0x80
#define MA_IS_STATIC 0x01

#define MA_MAX_SUBSET_COLS 4096  /* large-subset stack budget */

#define MA_CELL_DELETED 0x01
#define MA_CELL_EXPIRING 0x02
#define MA_CELL_EMPTY_VALUE 0x04
#define MA_CELL_ROW_TS 0x08
#define MA_CELL_ROW_TTL 0x10

#define MA_RT_STACK 16
#define MA_UNSUPPORTED 4

/* unsigned vint: leading-one count of first byte = extra bytes */
static inline int ma_uvint(const uint8_t *buf, int64_t total, int64_t *o,
                           uint64_t *val) {
    if (*o >= total) return -1;
    uint8_t first = buf[(*o)++];
    if (first < 0x80) { *val = first; return 0; }
    int extra = 0;
    uint8_t b = first;
    while (b & 0x80) { extra++; b = (uint8_t)(b << 1); }
    uint64_t v = first & (uint8_t)(0xFF >> extra);
    if (*o + extra > total) return -1;
    for (int i = 0; i < extra; i++) v = (v << 8) | buf[(*o)++];
    *val = v;
    return 0;
}

/* clustering block values -> scratch as composite components
 * (u16 len + bytes + 0x00); null values are UNSUPPORTED for rows (the
 * Python twin raises) but map to empty for marker bounds. Returns new
 * scratch length or -1 eof / -2 overflow. */
static int64_t ma_clustering(
    const uint8_t *buf, int64_t total, int64_t *o,
    const int32_t *fixed, int32_t count, int allow_null,
    uint8_t *scratch, int64_t sc_len, int64_t sc_cap)
{
    int32_t i = 0;
    while (i < count) {
        int32_t limit = count < i + 32 ? count : i + 32;
        uint64_t hdr;
        if (ma_uvint(buf, total, o, &hdr)) return -1;
        int32_t base = i;
        for (; i < limit; i++) {
            int shift = (i - base) * 2;
            int64_t vlen;
            const uint8_t *vptr = 0;
            if (hdr & (1ULL << (shift + 1))) {
                /* null: empty in marker bounds, corrupt in row clustering
                 * (the Python twin raises there) */
                if (!allow_null) return -1;
                vlen = 0;
            } else if (hdr & (1ULL << shift)) {        /* empty */
                vlen = 0;
            } else if (fixed[i] >= 0) {
                vlen = fixed[i];
                if (*o + vlen > total) return -1;
                vptr = buf + *o; *o += vlen;
            } else {
                uint64_t n;
                if (ma_uvint(buf, total, o, &n)) return -1;
                vlen = (int64_t)n;
                if (vlen < 0 || *o + vlen > total) return -1;
                vptr = buf + *o; *o += vlen;
            }
            if (vlen > 0xFFFF || sc_len + 3 + vlen > sc_cap) return -2;
            scratch[sc_len++] = (uint8_t)(vlen >> 8);
            scratch[sc_len++] = (uint8_t)vlen;
            if (vptr) { memcpy(scratch + sc_len, vptr, vlen); sc_len += vlen; }
            scratch[sc_len++] = 0;
        }
    }
    return sc_len;
}

int scan_cells_ma(
    const uint8_t *buf, int64_t total, int64_t start, int64_t end,
    /* serialization-header metadata */
    int64_t min_ts, int64_t min_ldt, int64_t min_ttl,
    int32_t n_clustering, const int32_t *clustering_fixed,
    int32_t n_reg, const uint8_t *reg_names, const int32_t *reg_name_off,
    const int32_t *reg_fixed, const uint8_t *reg_complex,
    int32_t n_stat, const uint8_t *stat_names, const int32_t *stat_name_off,
    const int32_t *stat_fixed, const uint8_t *stat_complex,
    /* scratch for composite prefixes + open-RT bounds */
    uint8_t *scratch, int64_t scratch_cap,
    /* capacities */
    int64_t cap_cells, int64_t cap_bytes,
    /* per-cell outputs — identical layout to scan_cells */
    uint8_t *key_data, int32_t *key_off,
    uint8_t *name_data, int32_t *name_off, uint8_t *name_valid,
    uint8_t *max_data, int32_t *max_off, uint8_t *max_valid,
    uint8_t *val_data, int32_t *val_off, uint8_t *val_valid,
    int64_t *ts, uint8_t *kind_out,
    int32_t *ttl_out, uint8_t *ttl_valid,
    int32_t *ldt_out, uint8_t *ldt_valid,
    int64_t *tsd, uint8_t *tsd_valid,
    /* per-partition outputs */
    int64_t *row_deleted, int32_t *row_cells,
    scan_out *out)
{
    int64_t o = start;
    int64_t n = 0, rows = 0;
    int64_t kb = 0, nb = 0, mb = 0, vb = 0;
    int rc_kind = 3; /* default error = corrupt */
    key_off[0] = 0; name_off[0] = 0; max_off[0] = 0; val_off[0] = 0;

    /* scratch layout: [0, half) row prefixes, [half, cap) open-RT names */
    int64_t half = scratch_cap / 2;
    int64_t rt_off[MA_RT_STACK]; int64_t rt_len[MA_RT_STACK];
    int64_t rt_mfda[MA_RT_STACK]; int64_t rt_ldt[MA_RT_STACK];

    while (o < end) {
        int64_t part_start = o, n0 = n, kb0 = kb, nb0 = nb, mb0 = mb, vb0 = vb;
        int rt_depth = 0;
        int64_t rt_used = half;

        if (rows >= cap_cells || n >= cap_cells) { o = part_start; goto capacity; }

        if (o + 2 > total) goto done;
        uint16_t keysize = rd_u16(buf + o); o += 2;
        if (o + keysize > total) goto corrupt;
        const uint8_t *key = buf + o; o += keysize;
        if (o + 12 > total) goto corrupt;
        int64_t part_mfda = rd_i64(buf + o + 4);
        o += 12;
        row_deleted[rows] = part_mfda;
        int32_t emitted = 0;

        /* emit helper macro: one output cell with composite name built
         * from (prefix bytes, optional component, optional component) */
#define MA_EMIT_CHECK(name_total, value_len, max_len)                       \
        do {                                                                \
            if (n + 1 > cap_cells || kb + keysize > cap_bytes ||            \
                nb + (name_total) > cap_bytes ||                            \
                vb + (value_len) > cap_bytes ||                             \
                mb + (max_len) > cap_bytes) {                               \
                o = part_start; goto capacity;                              \
            }                                                               \
        } while (0)
#define MA_FINISH_CELL()                                                    \
        do {                                                                \
            memcpy(key_data + kb, key, keysize); kb += keysize;             \
            n++;                                                            \
            key_off[n] = (int32_t)kb; name_off[n] = (int32_t)nb;            \
            max_off[n] = (int32_t)mb; val_off[n] = (int32_t)vb;             \
            emitted++;                                                      \
        } while (0)

        for (;;) {
            if (o >= total) goto corrupt;
            uint8_t flags = buf[o++];
            if (flags & MA_END_OF_PARTITION) break;

            if (flags & MA_IS_MARKER) {
                if (o >= total) goto corrupt;
                uint8_t mkind = buf[o++];
                if (o + 2 > total) goto corrupt;
                uint16_t nvals = rd_u16(buf + o); o += 2;
                if (nvals > (uint16_t)n_clustering) goto corrupt;
                int64_t blen = ma_clustering(buf, total, &o, clustering_fixed,
                                             nvals, 1, scratch, 0, half);
                if (blen == -1) goto corrupt;
                if (blen == -2) { rc_kind = MA_UNSUPPORTED; goto corrupt; }
                uint64_t skip;
                if (ma_uvint(buf, total, &o, &skip)) goto corrupt; /* body */
                if (ma_uvint(buf, total, &o, &skip)) goto corrupt; /* prev */

                int is_boundary = (mkind == 2 || mkind == 5);
                int is_start = (mkind == 1 || mkind == 7);
                /* exclusivity via the final end-of-component byte (twin
                 * of modern._decode_marker): incl start / excl end ->
                 * 0x00, excl start / incl end -> 0x01 */
                uint8_t start_eoc = (mkind == 1 || mkind == 2) ? 0x00 : 0x01;
                uint8_t end_eoc = (mkind == 6 || mkind == 5) ? 0x01 : 0x00;
                uint64_t d;
                if (is_boundary) {
                    int64_t end_mfda, end_ldt, st_mfda, st_ldt;
                    if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                    end_mfda = (int64_t)((uint64_t)min_ts + d);
                    if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                    end_ldt = (int64_t)((uint64_t)min_ldt + d);
                    if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                    st_mfda = (int64_t)((uint64_t)min_ts + d);
                    if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                    st_ldt = (int64_t)((uint64_t)min_ldt + d);
                    if (rt_depth == 0) goto corrupt;
                    rt_depth--;
                    if (rt_mfda[rt_depth] != end_mfda ||
                        rt_ldt[rt_depth] != end_ldt) goto corrupt;
                    /* close current range: name=stashed start, max=values eoc 1 */
                    MA_EMIT_CHECK(rt_len[rt_depth], 0, blen);
                    memcpy(name_data + nb, scratch + rt_off[rt_depth],
                           rt_len[rt_depth]);
                    nb += rt_len[rt_depth];
                    if (blen > 0) {
                        memcpy(max_data + mb, scratch, blen);
                        max_data[mb + blen - 1] = end_eoc;
                    }
                    mb += blen;
                    kind_out[n] = 't';
                    ts[n] = end_mfda;
                    name_valid[n] = 1; max_valid[n] = 1; val_valid[n] = 0;
                    ttl_valid[n] = 0; tsd_valid[n] = 0;
                    ldt_out[n] = ma_sat_ldt(end_ldt); ldt_valid[n] = 1;
                    MA_FINISH_CELL();
                    /* open the next range at the same prefix */
                    if (rt_depth >= MA_RT_STACK ||
                        rt_used + blen > scratch_cap) {
                        rc_kind = MA_UNSUPPORTED; goto corrupt;
                    }
                    memcpy(scratch + rt_used, scratch, blen);
                    if (blen > 0) scratch[rt_used + blen - 1] = start_eoc;
                    rt_off[rt_depth] = rt_used; rt_len[rt_depth] = blen;
                    rt_mfda[rt_depth] = st_mfda; rt_ldt[rt_depth] = st_ldt;
                    rt_used += blen; rt_depth++;
                    continue;
                }
                int64_t mfda, ldtv;
                if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                mfda = (int64_t)((uint64_t)min_ts + d);
                if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                ldtv = (int64_t)((uint64_t)min_ldt + d);
                if (is_start) {
                    if (rt_depth >= MA_RT_STACK ||
                        rt_used + blen > scratch_cap) {
                        rc_kind = MA_UNSUPPORTED; goto corrupt;
                    }
                    memcpy(scratch + rt_used, scratch, blen);
                    if (blen > 0) scratch[rt_used + blen - 1] = start_eoc;
                    rt_off[rt_depth] = rt_used; rt_len[rt_depth] = blen;
                    rt_mfda[rt_depth] = mfda; rt_ldt[rt_depth] = ldtv;
                    rt_used += blen; rt_depth++;
                    continue;
                }
                /* end bound */
                if (rt_depth == 0) goto corrupt;
                rt_depth--;
                if (rt_mfda[rt_depth] != mfda || rt_ldt[rt_depth] != ldtv)
                    goto corrupt;
                MA_EMIT_CHECK(rt_len[rt_depth], 0, blen);
                memcpy(name_data + nb, scratch + rt_off[rt_depth],
                       rt_len[rt_depth]);
                nb += rt_len[rt_depth];
                if (blen > 0) {
                    memcpy(max_data + mb, scratch, blen);
                    max_data[mb + blen - 1] = end_eoc;
                }
                mb += blen;
                kind_out[n] = 't';
                ts[n] = mfda;
                name_valid[n] = 1; max_valid[n] = 1; val_valid[n] = 0;
                ttl_valid[n] = 0; tsd_valid[n] = 0;
                ldt_out[n] = ma_sat_ldt(ldtv); ldt_valid[n] = 1;
                MA_FINISH_CELL();
                continue;
            }

            /* --- row --- */
            uint8_t extended = 0;
            if (flags & MA_EXTENSION_FLAG) {
                if (o >= total) goto corrupt;
                extended = buf[o++];
            }
            int is_static = extended & MA_IS_STATIC;

            /* prefix_plain at scratch[0..plen): clustering components */
            int64_t plen;
            if (is_static) {
                plen = 0;
                if ((int64_t)n_clustering * 3 > half) {
                    rc_kind = MA_UNSUPPORTED; goto corrupt;
                }
                for (int32_t i = 0; i < n_clustering; i++) {
                    scratch[plen++] = 0; scratch[plen++] = 0;   /* u16 0 */
                    scratch[plen++] = 0;                        /* eoc */
                }
            } else {
                plen = ma_clustering(buf, total, &o, clustering_fixed,
                                     n_clustering, 0, scratch, 0, half);
                if (plen == -1) goto corrupt;
                if (plen == -2) { rc_kind = MA_UNSUPPORTED; goto corrupt; }
            }
            int64_t static_extra = is_static ? 2 : 0; /* 0xFFFF prefix */

            uint64_t skip;
            if (ma_uvint(buf, total, &o, &skip)) goto corrupt; /* body size */
            if (ma_uvint(buf, total, &o, &skip)) goto corrupt; /* prev size */

            int has_row_ts = flags & MA_HAS_TIMESTAMP;
            int64_t row_ts = 0, row_ttl = 0, row_ldt = 0;
            int has_row_ttl = flags & MA_HAS_TTL;
            uint64_t d;
            if (has_row_ts) {
                if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                row_ts = (int64_t)((uint64_t)min_ts + d);
            }
            if (has_row_ttl) {
                if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                row_ttl = (int64_t)((uint64_t)min_ttl + d);
                if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                row_ldt = (int64_t)((uint64_t)min_ldt + d);
            }
            if (flags & MA_HAS_DELETION) {
                int64_t del_mfda, del_ldt;
                if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                del_mfda = (int64_t)((uint64_t)min_ts + d);
                if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                del_ldt = (int64_t)((uint64_t)min_ldt + d);
                /* 't' over the clustering prefix: name eoc 0, max eoc 1
                 * (plain prefix, no static marker — matches the twin) */
                MA_EMIT_CHECK(plen, 0, plen);
                memcpy(name_data + nb, scratch, plen); nb += plen;
                if (plen > 0) {
                    memcpy(max_data + mb, scratch, plen);
                    max_data[mb + plen - 1] = 0x01;
                }
                mb += plen;
                kind_out[n] = 't';
                ts[n] = del_mfda;
                name_valid[n] = 1; max_valid[n] = 1; val_valid[n] = 0;
                ttl_valid[n] = 0; tsd_valid[n] = 0;
                ldt_out[n] = ma_sat_ldt(del_ldt); ldt_valid[n] = 1;
                MA_FINISH_CELL();
            }

            int32_t n_cols = is_static ? n_stat : n_reg;
            const uint8_t *col_names = is_static ? stat_names : reg_names;
            const int32_t *col_name_off = is_static ? stat_name_off : reg_name_off;
            const int32_t *col_fixed = is_static ? stat_fixed : reg_fixed;
            const uint8_t *col_complex = is_static ? stat_complex : reg_complex;

            uint64_t missing = 0;
            uint8_t absent[MA_MAX_SUBSET_COLS];
            int use_absent = 0;
            if (!(flags & MA_HAS_ALL_COLUMNS)) {
                if (n_cols < 64) {
                    if (ma_uvint(buf, total, &o, &missing)) goto corrupt;
                } else if (n_cols <= MA_MAX_SUBSET_COLS) {
                    /* Columns.serializer large subset: uvint delta (count
                     * of missing), then PRESENT indices when
                     * columnCount < supersetCount/2, else MISSING ones */
                    uint64_t delta, idx;
                    if (ma_uvint(buf, total, &o, &delta)) goto corrupt;
                    if (delta > (uint64_t)n_cols) goto corrupt;
                    int64_t column_count = (int64_t)n_cols - (int64_t)delta;
                    use_absent = 1;
                    if (column_count < n_cols / 2) {
                        memset(absent, 1, (size_t)n_cols);
                        for (int64_t ci = 0; ci < column_count; ci++) {
                            if (ma_uvint(buf, total, &o, &idx)) goto corrupt;
                            if (idx >= (uint64_t)n_cols) goto corrupt;
                            absent[idx] = 0;
                        }
                    } else {
                        memset(absent, 0, (size_t)n_cols);
                        for (uint64_t ci = 0; ci < delta; ci++) {
                            if (ma_uvint(buf, total, &o, &idx)) goto corrupt;
                            if (idx >= (uint64_t)n_cols) goto corrupt;
                            absent[idx] = 1;
                        }
                    }
                } else { rc_kind = MA_UNSUPPORTED; goto corrupt; }
            }

            if (has_row_ts) {
                /* pk liveness -> 2.x row marker: prefix + empty component */
                MA_EMIT_CHECK(static_extra + plen + 3, 0, 0);
                if (is_static) {
                    name_data[nb++] = 0xFF; name_data[nb++] = 0xFF;
                }
                memcpy(name_data + nb, scratch, plen); nb += plen;
                name_data[nb++] = 0; name_data[nb++] = 0; name_data[nb++] = 0;
                ts[n] = row_ts;
                name_valid[n] = 1; max_valid[n] = 0;
                val_valid[n] = 1; /* empty value, matches Python b"" */
                tsd_valid[n] = 0;
                if (has_row_ttl) {
                    kind_out[n] = 'e';
                    ttl_out[n] = (int32_t)row_ttl; ttl_valid[n] = 1;
                    ldt_out[n] = ma_sat_ldt(row_ldt); ldt_valid[n] = 1;
                } else {
                    kind_out[n] = 'c';
                    ttl_valid[n] = 0; ldt_valid[n] = 0;
                }
                MA_FINISH_CELL();
            }

            for (int32_t c = 0; c < n_cols; c++) {
                if (!(flags & MA_HAS_ALL_COLUMNS) &&
                    (use_absent ? absent[c] : ((missing >> c) & 1)))
                    continue;
                int32_t cname_len = col_name_off[c + 1] - col_name_off[c];
                const uint8_t *cname = col_names + col_name_off[c];
                int64_t ncells = 1;
                if (col_complex[c]) {
                    if (flags & MA_HAS_COMPLEX_DELETION) {
                        int64_t cd_mfda, cd_ldt;
                        if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                        cd_mfda = (int64_t)((uint64_t)min_ts + d);
                        if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                        cd_ldt = (int64_t)((uint64_t)min_ldt + d);
                        if (cd_mfda != LONG_MIN_SENTINEL) {
                            int64_t pl = plen + 3 + cname_len;
                            MA_EMIT_CHECK(static_extra + pl,
                                          0, static_extra + pl);
                            int64_t nbase = nb, mbase = mb;
                            if (is_static) {
                                name_data[nb++] = 0xFF; name_data[nb++] = 0xFF;
                                max_data[mb++] = 0xFF; max_data[mb++] = 0xFF;
                            }
                            memcpy(name_data + nb, scratch, plen); nb += plen;
                            name_data[nb++] = (uint8_t)(cname_len >> 8);
                            name_data[nb++] = (uint8_t)cname_len;
                            memcpy(name_data + nb, cname, cname_len);
                            nb += cname_len;
                            name_data[nb++] = 0;
                            memcpy(max_data + mb, name_data + nbase +
                                   (is_static ? 2 : 0), pl);
                            mb += pl;
                            max_data[mb - 1] = 0x01;
                            (void)mbase;
                            kind_out[n] = 't';
                            ts[n] = cd_mfda;
                            name_valid[n] = 1; max_valid[n] = 1;
                            val_valid[n] = 0; ttl_valid[n] = 0;
                            tsd_valid[n] = 0;
                            ldt_out[n] = ma_sat_ldt(cd_ldt); ldt_valid[n] = 1;
                            MA_FINISH_CELL();
                        }
                    }
                    uint64_t nc;
                    if (ma_uvint(buf, total, &o, &nc)) goto corrupt;
                    ncells = (int64_t)nc;
                }
                for (int64_t ci = 0; ci < ncells; ci++) {
                    if (o >= total) goto corrupt;
                    uint8_t cf = buf[o++];
                    int is_del = cf & MA_CELL_DELETED;
                    int is_exp = cf & MA_CELL_EXPIRING;
                    int has_val = !(cf & MA_CELL_EMPTY_VALUE);
                    int64_t cts;
                    if (cf & MA_CELL_ROW_TS) {
                        if (!has_row_ts) goto corrupt;
                        cts = row_ts;
                    } else {
                        if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                        cts = (int64_t)((uint64_t)min_ts + d);
                    }
                    int64_t cldt = 0, cttl = 0;
                    int ldt_set = 0, ttl_set = 0;
                    if (is_del || is_exp) {
                        if (cf & MA_CELL_ROW_TTL) {
                            cldt = row_ldt; cttl = row_ttl;
                            ldt_set = has_row_ttl; ttl_set = has_row_ttl;
                        } else {
                            if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                            cldt = (int64_t)((uint64_t)min_ldt + d);
                            ldt_set = 1;
                            if (is_exp) {
                                if (ma_uvint(buf, total, &o, &d)) goto corrupt;
                                cttl = (int64_t)((uint64_t)min_ttl + d);
                                ttl_set = 1;
                            }
                        }
                    }
                    const uint8_t *path = 0; int64_t path_len = 0;
                    if (col_complex[c]) {
                        uint64_t pl;
                        if (ma_uvint(buf, total, &o, &pl)) goto corrupt;
                        path_len = (int64_t)pl;
                        if (path_len < 0 || o + path_len > total) goto corrupt;
                        if (path_len > 0xFFFF) { rc_kind = MA_UNSUPPORTED; goto corrupt; }
                        path = buf + o; o += path_len;
                    }
                    const uint8_t *val = 0; int64_t vlen = 0;
                    if (has_val) {
                        if (col_fixed[c] >= 0) {
                            vlen = col_fixed[c];
                            if (o + vlen > total) goto corrupt;
                            val = buf + o; o += vlen;
                        } else {
                            uint64_t vl;
                            if (ma_uvint(buf, total, &o, &vl)) goto corrupt;
                            vlen = (int64_t)vl;
                            if (vlen < 0 || o + vlen > total) goto corrupt;
                            val = buf + o; o += vlen;
                        }
                    }
                    int64_t name_total = static_extra + plen + 3 + cname_len +
                                         (col_complex[c] ? 3 + path_len : 0);
                    int64_t out_vlen = is_del ? 4 : vlen;
                    MA_EMIT_CHECK(name_total, out_vlen, 0);
                    if (is_static) {
                        name_data[nb++] = 0xFF; name_data[nb++] = 0xFF;
                    }
                    memcpy(name_data + nb, scratch, plen); nb += plen;
                    name_data[nb++] = (uint8_t)(cname_len >> 8);
                    name_data[nb++] = (uint8_t)cname_len;
                    memcpy(name_data + nb, cname, cname_len); nb += cname_len;
                    name_data[nb++] = 0;
                    if (col_complex[c]) {
                        name_data[nb++] = (uint8_t)(path_len >> 8);
                        name_data[nb++] = (uint8_t)path_len;
                        if (path_len) {
                            memcpy(name_data + nb, path, path_len);
                            nb += path_len;
                        }
                        name_data[nb++] = 0;
                    }
                    name_valid[n] = 1; max_valid[n] = 0; tsd_valid[n] = 0;
                    ts[n] = cts;
                    if (is_del) {
                        /* 2.x DeletedColumn payload: i32 ldt big-endian
                         * (0 when the ldt is unset, like the Python twin,
                         * which also leaves the ldt COLUMN null then) */
                        int32_t lv = ldt_set ? ma_sat_ldt(cldt) : 0;
                        val_data[vb] = (uint8_t)((uint32_t)lv >> 24);
                        val_data[vb + 1] = (uint8_t)((uint32_t)lv >> 16);
                        val_data[vb + 2] = (uint8_t)((uint32_t)lv >> 8);
                        val_data[vb + 3] = (uint8_t)lv;
                        vb += 4;
                        kind_out[n] = 'd';
                        val_valid[n] = 1;
                        if (ldt_set) { ldt_out[n] = lv; ldt_valid[n] = 1; }
                        else ldt_valid[n] = 0;
                        ttl_valid[n] = 0;
                    } else if (is_exp) {
                        if (vlen) { memcpy(val_data + vb, val, vlen); vb += vlen; }
                        kind_out[n] = 'e';
                        val_valid[n] = 1;
                        if (ldt_set) { ldt_out[n] = ma_sat_ldt(cldt); ldt_valid[n] = 1; }
                        else ldt_valid[n] = 0;
                        if (ttl_set) { ttl_out[n] = (int32_t)cttl; ttl_valid[n] = 1; }
                        else ttl_valid[n] = 0;
                    } else {
                        if (vlen) { memcpy(val_data + vb, val, vlen); vb += vlen; }
                        kind_out[n] = 'c';
                        val_valid[n] = 1;
                        ttl_valid[n] = 0; ldt_valid[n] = 0;
                    }
                    MA_FINISH_CELL();
                }
            }
        }

        if (rt_depth != 0) goto corrupt; /* unclosed range bound */
        if (emitted == 0) {
            if (n + 1 > cap_cells || kb + keysize > cap_bytes) {
                o = part_start; goto capacity;
            }
            kind_out[n] = 'r';
            memcpy(key_data + kb, key, keysize); kb += keysize;
            ts[n] = LONG_MIN_SENTINEL;
            name_valid[n] = 0; val_valid[n] = 0; max_valid[n] = 0;
            ttl_valid[n] = 0; ldt_valid[n] = 0; tsd_valid[n] = 0;
            n++;
            key_off[n] = (int32_t)kb; name_off[n] = (int32_t)nb;
            max_off[n] = (int32_t)mb; val_off[n] = (int32_t)vb;
            emitted = 1;
        }
        row_cells[rows] = emitted;
        rows++;
        continue;

    capacity:
        n = n0; kb = kb0; nb = nb0; mb = mb0; vb = vb0;
        out->n = n; out->rows = rows; out->consumed = o;
        out->key_bytes = kb; out->name_bytes = nb;
        out->max_bytes_used = mb; out->val_bytes = vb;
        return (n == 0) ? 2 : 1;

    corrupt:
        /* partition-granular rewind: everything decoded from COMPLETE
         * partitions stays; the broken partition contributes nothing */
        n = n0; kb = kb0; nb = nb0; mb = mb0; vb = vb0;
        out->n = n; out->rows = rows; out->consumed = part_start;
        out->key_bytes = kb; out->name_bytes = nb;
        out->max_bytes_used = mb; out->val_bytes = vb;
        return rc_kind;
    }

done:
    out->n = n; out->rows = rows; out->consumed = o;
    out->key_bytes = kb; out->name_bytes = nb;
    out->max_bytes_used = mb; out->val_bytes = vb;
    return 0;
#undef MA_EMIT_CHECK
#undef MA_FINISH_CELL
}
