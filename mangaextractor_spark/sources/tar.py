"""WebDataset-style tar-shard source.

WebDataset (the de-facto large-scale training container: tar shards
whose member names share a sample key, e.g. ``0007.png`` +
``0007.txt`` + ``0007.json``) makes the SHARD the unit of parallelism:
a trainer — and this reader — streams whole tars, never seeks inside
one. The Spark-native form: ``binaryFile`` lists the shard files
(split-by-file, so one shard = one task = sequential I/O, the same
contract ``webdataset``'s own loader has), and an Arrow-batched
``mapInPandas`` kernel walks each shard's ustar headers and emits one
row per member.

The ustar parser is from scratch (POSIX.1-1988 layout): 512-byte
header blocks — name [0:100] NUL-trimmed, size [124:136] octal,
typeflag [156] ('0'/NUL = regular file), checksum [148:156] verified
as the unsigned byte sum of the header with the checksum field blanked
— each followed by ceil(size/512) data blocks, terminated by two zero
blocks. Fixtures are WRITTEN with the stdlib ``tarfile`` module, so
the parser is cross-checked against an independent implementation
(and the oracle manifest is derived from the source payloads before
tar-ing — see fixtures/shared.py:tar_fixture_dir).

At 100 TB: shards are the checkpoint/resume and ordering unit
(shard_plan emits the manifest this reader consumes); a shard is
bounded (~1 GB by convention) so the per-task memory is bounded; no
shuffle exists until the trainer-side sample join, which groups
members by (shard, sample_key) WITHIN the already-shard-local rows —
a map-side groupBy.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BLOCK = 512


class TarFormatError(ValueError):
    pass


def parse_ustar(blob: bytes) -> list[tuple[str, bytes]]:
    """Parse a ustar archive into [(member_name, payload)] in archive
    order. Regular files only (directories and pax/gnu extensions are
    skipped by typeflag); header checksums are verified."""
    out: list[tuple[str, bytes]] = []
    off = 0
    n = len(blob)
    while off + _BLOCK <= n:
        hdr = blob[off : off + _BLOCK]
        if hdr == b"\0" * _BLOCK:  # first of the two terminating zero blocks
            break
        stored = int(hdr[148:156].split(b"\0")[0].strip() or b"0", 8)
        blanked = hdr[:148] + b" " * 8 + hdr[156:]
        if sum(blanked) != stored:
            raise TarFormatError(f"bad header checksum at offset {off}")
        name = hdr[0:100].split(b"\0")[0].decode("utf-8")
        size = int(hdr[124:136].split(b"\0")[0].strip() or b"0", 8)
        typeflag = hdr[156:157]
        data_start = off + _BLOCK
        data_end = data_start + size
        if data_end > n:
            raise TarFormatError(f"member {name!r} truncated")
        if typeflag in (b"0", b"\0"):
            out.append((name, blob[data_start:data_end]))
        off = data_start + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
    return out


def read_tar_members(spark: SparkSession, shard_dir: str) -> DataFrame:
    """(shard, member, n_bytes, md5hex) — one row per regular member of
    every ``*.tar`` under ``shard_dir``. One shard = one binaryFile row
    = one task; the parse + digest run in a single Arrow batch pass."""

    def kern(batches: Iterator) -> Iterator:
        import hashlib
        import os

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(path)
                for name, payload in parse_ustar(bytes(blob)):
                    rows.append(
                        (shard, name, len(payload), hashlib.md5(payload).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["shard", "member", "n_bytes", "md5hex"]
            )

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(shard_dir)
        .select("path", "content")
    )
    return df.mapInPandas(
        kern, "shard string, member string, n_bytes long, md5hex string"
    )


def sample_key(member: F.Column | str) -> F.Column:
    """WebDataset sample key: the member name up to the FIRST dot
    (``0007.seg.png`` -> ``0007``), matching webdataset's own rule."""
    return F.substring_index(member, ".", 1)


def component_ext(member: F.Column | str) -> F.Column:
    """Everything after the first dot (``0007.seg.png`` -> ``seg.png``)."""
    return F.regexp_replace(member, r"^[^.]*\.", "")


def build_ustar(members: list[tuple[str, bytes]]) -> bytes:
    """Build a ustar archive from [(member_name, payload)] — the write
    twin of ``parse_ustar``, also from scratch. Deterministic bytes:
    mode 0644, uid/gid 0, mtime 0, members in the order given. The
    POSIX checksum convention (6 octal digits, NUL, space; field
    blanked to spaces while summing) matches what stdlib tarfile
    emits, so stdlib can read these archives (tested) and vice versa."""
    blocks: list[bytes] = []
    for name, payload in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise TarFormatError(f"member name too long for ustar: {name!r}")
        hdr = bytearray(_BLOCK)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = b"0000644\0"  # mode
        hdr[108:116] = b"0000000\0"  # uid
        hdr[116:124] = b"0000000\0"  # gid
        hdr[124:136] = f"{len(payload):011o}".encode() + b"\0"
        hdr[136:148] = b"00000000000\0"  # mtime 0
        hdr[148:156] = b" " * 8  # checksum field blanked while summing
        hdr[156:157] = b"0"  # regular file
        hdr[257:263] = b"ustar\0"
        hdr[263:265] = b"00"
        hdr[148:156] = f"{sum(hdr):06o}".encode() + b"\0 "
        blocks.append(bytes(hdr))
        blocks.append(payload)
        blocks.append(b"\0" * ((-len(payload)) % _BLOCK))
    blocks.append(b"\0" * (2 * _BLOCK))
    return b"".join(blocks)
