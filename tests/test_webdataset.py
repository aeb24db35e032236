"""ustar parser + WebDataset query gates.

Oracle parity for webdataset_ingest / webdataset_samples runs in
test_queries_oracle.py (registry-driven; the oracle manifest is
computed from source payloads BEFORE tar-ing, so parity proves the
parser). Here: the parser's edge cases and failure modes, plus the
cross-check against stdlib tarfile as a second independent reader.
"""

from __future__ import annotations

import hashlib
import io
import tarfile

import pandas as pd
import pytest

from mangaextractor_spark.queries import REGISTRY
from mangaextractor_spark.sources.tar import TarFormatError, parse_ustar


def _tar(members, fmt=tarfile.USTAR_FORMAT) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def test_parse_ustar_edge_sizes():
    # empty payload, exactly one block, block-boundary straddle
    members = [("a.bin", b""), ("b.bin", b"x" * 512), ("c.bin", b"y" * 513)]
    assert parse_ustar(_tar(members)) == members


def test_parse_ustar_skips_directories():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo(name="dir/")
        d.type = tarfile.DIRTYPE
        d.mtime = 0
        tf.addfile(d)
        f = tarfile.TarInfo(name="dir/f.txt")
        f.size = 3
        f.mtime = 0
        tf.addfile(f, io.BytesIO(b"abc"))
    assert parse_ustar(buf.getvalue()) == [("dir/f.txt", b"abc")]


def test_parse_ustar_rejects_corrupt_checksum():
    blob = bytearray(_tar([("a.txt", b"hello")]))
    blob[0] ^= 0xFF  # flip a name byte: checksum no longer matches
    with pytest.raises(TarFormatError, match="checksum"):
        parse_ustar(bytes(blob))


def test_parse_ustar_rejects_truncation():
    blob = _tar([("a.bin", b"z" * 2000)])
    with pytest.raises(TarFormatError, match="truncated"):
        parse_ustar(blob[: 512 + 512])  # header + partial data only


def test_parser_agrees_with_stdlib_on_fixture():
    from mangaextractor_spark.fixtures.shared import tar_fixture_dir

    import os

    d = tar_fixture_dir()
    for shard in sorted(p for p in os.listdir(d) if p.endswith(".tar")):
        blob = open(os.path.join(d, shard), "rb").read()
        mine = parse_ustar(blob)
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            std = [
                (m.name, tf.extractfile(m).read())
                for m in tf.getmembers()
                if m.isfile()
            ]
        assert mine == std


def test_webdataset_samples_complete(spark):
    pdf = REGISTRY["webdataset_samples"].spark(spark, "/root/testdata/sf0.01").toPandas()
    # every sample has at least png + txt; json is the optional third
    assert (pdf.n_components >= 2).all()
    assert pdf.components.str.startswith("json,png,txt").sum() + (
        pdf.components == "png,txt"
    ).sum() == len(pdf)
    import os

    from mangaextractor_spark.fixtures.shared import tar_fixture_dir

    man = pd.read_parquet(os.path.join(tar_fixture_dir(), "manifest.parquet"))
    assert pdf.total_bytes.sum() == man.n_bytes.sum()


def test_build_ustar_round_trip_and_stdlib_interop():
    from mangaextractor_spark.sources.tar import build_ustar

    members = [
        ("000000000001.txt", b"hello world"),
        ("a.bin", b""),
        ("b.bin", b"x" * 512),
        ("c.bin", b"y" * 1000),
    ]
    blob = build_ustar(members)
    assert len(blob) % 512 == 0
    assert parse_ustar(blob) == members
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        std = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers() if m.isfile()]
    assert std == members


def test_build_ustar_rejects_long_names():
    from mangaextractor_spark.sources.tar import build_ustar

    with pytest.raises(TarFormatError, match="too long"):
        build_ustar([("x" * 101, b"")])


def test_webdataset_emit_covers_corpus(spark):
    pdf = REGISTRY["webdataset_emit"].spark(spark, "/root/testdata/sf0.01").toPandas()
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    assert len(pdf) == len(docs)  # every document lands in exactly one shard
    assert pdf.member.is_unique
    assert pdf.shard.nunique() == 16
    got = dict(zip(pdf.member, pdf.md5hex))
    import hashlib

    for r in docs.sample(20, random_state=0).itertuples():
        assert got[f"{r.doc_id:012d}.txt"] == hashlib.md5(r.text.encode()).hexdigest()
