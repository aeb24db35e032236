"""File-mode ingestion tests: directory tree of PNGs -> (documents,
media) -> full pipeline, with directory-name parsing providing document
identity (reference core/processor.py:256-299 directory scan semantics:
skip tmp/concluido/capa dirs, page order = sorted file list).
"""

from __future__ import annotations

import pytest

from mangaextractor_spark.fixtures.generator import CorpusSpec, generate_corpus
from mangaextractor_spark.pipeline.extract import extract_spans
from mangaextractor_spark.sources.binary_files import ingest_directory

N_DOCS = 6


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(CorpusSpec(n_docs=N_DOCS, seed=7))


@pytest.fixture(scope="module")
def file_tree(corpus, tmp_path_factory):
    """Write each doc's pages into '[TestScan] Doc NNN - Volume V Capitulo C/
    page_KKKK.png'; also plant files the scan must skip."""
    root = tmp_path_factory.mktemp("pages")
    ref_map = {}  # original media_ref -> relative file path
    docs = corpus["documents"]
    for di, (_, row) in enumerate(docs.iterrows()):
        d = root / f"[TestScan] Doc {di:03d} - Volume {di + 1} Capitulo {di + 2}"
        d.mkdir()
        page_no = 0
        for sp in row["spans"]:
            if sp["kind"] != "image":
                continue
            fname = f"page_{page_no:04d}.png"
            png = corpus["media"].set_index("media_ref").loc[sp["media_ref"], "image_bytes"]
            (d / fname).write_bytes(bytes(png))
            ref_map[sp["media_ref"]] = f"{d.name}/{fname}"
            page_no += 1
        # skip-list content: a tmp artifact dir and a cover folder
        (d / "tmp").mkdir()
        (d / "tmp" / "junk.png").write_bytes(b"not a real png")
    capa = root / "capa_covers"
    capa.mkdir()
    (capa / "cover.png").write_bytes(b"nope")
    return root, ref_map


def test_ingest_shapes_and_parsing(spark, file_tree, corpus):
    root, ref_map = file_tree
    docs, media = ingest_directory(spark, str(root))
    assert media.count() == len(ref_map), "skip dirs must be excluded"
    got_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert got_ids == {f"Doc {i:03d}/{i + 1}/{i + 2}" for i in range(N_DOCS)}
    row = docs.first()
    assert [f.name for f in docs.schema["spans"].dataType.elementType.fields] == [
        "kind",
        "text",
        "media_ref",
        "offset",
    ]
    offsets = [s["offset"] for s in row.spans]
    assert offsets == list(range(len(offsets))), "spans must be offset-ordered"


def test_file_mode_pipeline_matches_golden_pages(spark, file_tree, corpus):
    """OCR result per page via the file route == golden bubble texts in
    reading order (non-empty only, the sequence rule)."""
    root, ref_map = file_tree
    docs, media = ingest_directory(spark, str(root))
    result = extract_spans(docs, media)
    got = {}
    for r in result.filter("media_ref != ''").collect():
        got.setdefault(r.media_ref, []).append((r.order, r.text))
    got = {k: [t for _, t in sorted(v)] for k, v in got.items()}

    g = corpus["golden_regions"]
    for orig_ref, grp in g[g.glyph_text != ""].groupby("media_ref"):
        expected = list(grp.sort_values("reading_rank")["glyph_text"])
        assert got.get(ref_map[orig_ref], []) == expected, orig_ref


def test_file_mode_ingests_and_decodes_jpeg_files(spark, tmp_path, corpus):
    """The source's *.{png,jpg,jpeg} glob is honest end-to-end: pages
    stored as .jpg files ingest AND extract golden text."""
    from mangaextractor_spark.fixtures.jpeg import encode_gray_jpeg
    from mangaextractor_spark.fixtures.png import decode_gray_png

    root = tmp_path / "jpgtree"
    d = root / "[TestScan] JDoc - Volume 1 Capitulo 2"
    d.mkdir(parents=True)
    g = corpus["golden_regions"]
    some_ref = corpus["media"].iloc[0]["media_ref"]
    img = decode_gray_png(bytes(corpus["media"].iloc[0]["image_bytes"]))
    (d / "page_0000.jpg").write_bytes(encode_gray_jpeg(img, quality=95))

    docs, media = ingest_directory(spark, str(root))
    assert media.count() == 1
    spans = extract_spans(docs, media, robust=True)
    got = [r.text for r in spans.orderBy("order").collect()]
    gg = g[g.media_ref == some_ref]
    exp = [r["glyph_text"] for _, r in gg.sort_values("reading_rank").iterrows() if r["glyph_text"]]
    assert got == exp
