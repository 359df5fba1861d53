"""SSTable filename parsing.

Two public layouts (reference: Cassandra Descriptor.fromFilename, used at
SSTableRecordReader.java:99-104):

- legacy (<= 2.1):  <keyspace>-<table>-<version>-<generation>-<component>
  e.g. ``testdata-randomtable-jb-5-Data.db``
- 2.2+ ("big" era): <version>-<generation>-big-<component>
  e.g. ``la-5-big-Data.db`` (keyspace/table come from the directory path)

Version capability flag (Cassandra Descriptor.Version):
``has_row_size_and_column_count`` — row header carries an 8-byte row size and
4-byte column count for versions < "ja" (i.e. 1.2.x "ic" era); 2.0+ uses an
end-of-row marker instead (SSTableColumnScanner.java:83-87,116-119).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

CURRENT_VERSION = "jb"

#: modern (3.x row format) versions the decoder is verified against:
#: 3.x "ma".."me" and 4.x "na".."nc" keep the same row-body layout, and
#: 5.0's "oa" differs only in the fixed-width DeletionTime encoding
#: (CASSANDRA-14227: localDeletionTime becomes an UNSIGNED int with
#: 0xFFFFFFFF as the live sentinel, extending expirations past 2038) plus
#: Statistics-metadata-level fields the row scan doesn't read. Statistics
#: parsing is version-gated separately: 4.0+ ("na"..) adds CRC32 metadata
#: checksums to Statistics.db (MetadataSerializer hasMetadataChecksum).
MODERN_VERSION_MIN = "ma"
MODERN_VERSION_MAX = "oa"

#: the exact big-format versions Cassandra ever released in the modern
#: row format (BigFormat.java version history): 3.0/3.x ma..me, 4.0/4.1
#: na..nc, 5.0 oa. An explicit set, NOT the lexical range [ma, oa] — a
#: hypothetical future 'nd'..'nz' release could change the row layout
#: and must be rejected, not guessed (same posture as post-oa versions).
MODERN_VERSIONS = frozenset(
    ["ma", "mb", "mc", "md", "me", "na", "nb", "nc", "oa"]
)


def has_metadata_checksum(version: str) -> bool:
    """4.0+ Statistics.db carries CRC32 checksums after the TOC and each
    component (Cassandra BigFormat hasMetadataChecksum: version >= na)."""
    return version >= "na"


def has_uint_deletion_time(version: str) -> bool:
    """5.0+ serializes fixed-width localDeletionTime as an unsigned int
    with 0xFFFFFFFF = no-deletion (BigFormat hasUIntDeletionTime:
    version >= oa; CASSANDRA-14227)."""
    return version >= "oa"


#: BTI ("trie-index", Cassandra 5.0's second on-disk format, filenames
#: <version>-<gen>-bti-<component>) version -> the BIG-format version with
#: the identical Data.db/Statistics.db serialization. BtiFormat changes
#: only the INDEX structures (Partitions.db/Rows.db tries replace
#: Index.db/Summary.db); partition/row/cell bytes and the stats metadata
#: are shared with the big format ("da" <-> "oa", both 5.0). Data files
#: from BTI tables therefore decode through the oa path with whole-file
#: splits (no Index.db to cut on; the trie sidecars are skipped).
BTI_ROW_FORMAT_EQUIV = {"da": "oa"}


def effective_version(version: str, fmt: str = "big") -> str:
    """Filename version -> the big-format version whose row serialization
    governs decode (identity for big/legacy versions). An unknown BTI
    version is REJECTED rather than guessed: bti versions share no
    lexical order with big versions ('db' would otherwise read as a
    pre-3.0 legacy format and misparse)."""
    if fmt == "bti":
        if version not in BTI_ROW_FORMAT_EQUIV:
            raise UnsupportedVersionError(
                f"BTI format version '{version}' is not supported: known "
                f"row-format equivalents exist for "
                f"{sorted(BTI_ROW_FORMAT_EQUIV)} only"
            )
        return BTI_ROW_FORMAT_EQUIV[version]
    # identity for big/legacy names: a (nonsensical) 'da-N-big-*' file
    # must NOT silently borrow the bti mapping and decode as 5.0
    return version


class UnsupportedVersionError(Exception):
    """SSTable format version outside the verified decode range.

    Deliberately NOT a ValueError: the corrupt-skip machinery
    (``skip_corrupt``) swallows ValueError into a '!' sentinel, and an
    unsupported version is a capability gap, not corrupt data — it must
    fail the job with a clear message either way."""


def check_modern_version(version: str) -> None:
    """Reject modern-format versions outside the verified set."""
    if version not in MODERN_VERSIONS:
        raise UnsupportedVersionError(
            f"SSTable format version '{version}' is not supported: the "
            f"modern-format decoder is verified for "
            f"{sorted(MODERN_VERSIONS)} (Cassandra 3.x/4.x/5.0 big "
            "format); other versions may change the row layout and would "
            "misparse silently if guessed"
        )

_LEGACY = re.compile(
    r"^(?P<ks>[^-]+(?:-[^-]+)*)-(?P<table>[^-]+)-(?P<version>[a-z]{2})-(?P<gen>\d+)-(?P<comp>[A-Za-z]+\.(?:db|txt|sha1|crc32))$"
)
_BIG = re.compile(
    r"^(?P<version>[a-z]{2})-(?P<gen>\d+)-(?P<fmt>big|bti)-(?P<comp>[A-Za-z]+\.(?:db|txt|sha1|crc32))$"
)


@dataclass(frozen=True)
class Descriptor:
    keyspace: str
    table: str
    version: str
    generation: int
    component: str
    fmt: str = "big"  # "big" | "bti" (2.2+ layouts); legacy names are big

    @property
    def has_row_size_and_column_count(self) -> bool:
        return self.version < "ja"

    def sibling(self, component: str) -> str:
        """Filename of another component of the same SSTable."""
        if self.keyspace:
            return f"{self.keyspace}-{self.table}-{self.version}-{self.generation}-{component}"
        return f"{self.version}-{self.generation}-{self.fmt}-{component}"


def parse_filename(path: str) -> Descriptor:
    name = os.path.basename(path)
    m = _BIG.match(name)
    if m:
        # table/keyspace from the directory: .../<ks>/<table>-<cfid>/la-5-big-Data.db
        parent = os.path.basename(os.path.dirname(path))
        table = parent.split("-")[0] if parent else ""
        ks = os.path.basename(os.path.dirname(os.path.dirname(path)))
        return Descriptor(
            keyspace="", table=table or ks, version=m.group("version"),
            generation=int(m.group("gen")), component=m.group("comp"),
            fmt=m.group("fmt"),
        )
    m = _LEGACY.match(name)
    if m:
        # keyspace may itself contain dashes; table is the second-to-last field
        ks_table = m.group("ks"), m.group("table")
        return Descriptor(
            keyspace=ks_table[0], table=ks_table[1], version=m.group("version"),
            generation=int(m.group("gen")), component=m.group("comp"),
        )
    raise ValueError(f"unrecognized sstable filename: {name}")


def version_of(path: str, default: str = CURRENT_VERSION) -> str:
    """EFFECTIVE row-format version from the filename (BTI versions map
    to their big-format serialization twin); falls back to CURRENT like
    the reference (SSTableRecordReader.java:99-104 swallows parse
    failures)."""
    try:
        d = parse_filename(path)
    except ValueError:
        return default
    return effective_version(d.version, d.fmt)
