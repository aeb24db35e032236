"""Write-once shared fixture parquet for oracle-checked media queries.

The driver's DuckDB oracle can only see data through SQL, so binary-
media queries are checkable only if BOTH engines read the SAME bytes:
this module materializes the deterministic fixture media table
(mixed PNG/JPEG pages + capa cover rows, columns media_ref +
image_bytes ONLY — no helper columns the oracle could cheat with) to a
stable path at first use; the Spark query reads it with
spark.read.parquet and the oracle with read_parquet() over the same
file. Import-time generation keeps the file present before either
engine runs.
"""

from __future__ import annotations

import os
import tempfile

# Version the filename with the generation params: changing the spec
# below must never silently reuse a stale file.
_SPEC = dict(
    n_docs=12, seed=42, p_jpeg=0.5, p_color_jpeg=0.5, p_cover=0.75, color_covers=True
)
FIXTURE_DIR = os.environ.get(
    "SPARK_GRAFT_FIXTURE_DIR", os.path.join(tempfile.gettempdir(), "mangaextractor_spark_fixtures")
)
_NAME = "media_" + "_".join(f"{k}{v}" for k, v in sorted(_SPEC.items())) + ".parquet"


_PDF_SPEC = dict(n_docs=40, seed=7)
_PDF_NAME = "pdf_" + "_".join(f"{k}{v}" for k, v in sorted(_PDF_SPEC.items())) + ".parquet"


def pdf_fixture_path() -> str:
    """Write-once (doc_id, pdf_bytes) fixture: deterministic seeded
    word-sentence documents rendered as minimal uncompressed PDFs.
    Text is ASCII with parens/backslash included so the escape rules
    are genuinely exercised."""
    path = os.path.join(FIXTURE_DIR, _PDF_NAME)
    if os.path.exists(path):
        return path
    import numpy as np
    import pandas as pd

    from .generator import _VOCAB
    from .pdf import build_simple_pdf

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rows = []
    for di in range(_PDF_SPEC["n_docs"]):
        rng = np.random.Generator(np.random.PCG64(_PDF_SPEC["seed"] * 1000 + di))
        lines = []
        for _ in range(int(rng.integers(1, 6))):
            words = [_VOCAB[int(i)] for i in rng.integers(0, len(_VOCAB), rng.integers(3, 9))]
            if rng.random() < 0.4:
                words[0] = f"({words[0]})"  # exercise string escaping
            if rng.random() < 0.2:
                words[-1] = words[-1] + "\\"
            lines.append(" ".join(words))
        rows.append({"doc_id": f"pdf{di:03d}", "pdf_bytes": build_simple_pdf(lines)})
    tmp = tempfile.mktemp(dir=FIXTURE_DIR, suffix=".parquet.tmp")
    pd.DataFrame(rows).to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


def media_fixture_path() -> str:
    """Return the path of the shared media fixture, generating it once
    (atomic rename — safe under concurrent pytest/driver processes)."""
    path = os.path.join(FIXTURE_DIR, _NAME)
    if os.path.exists(path):
        return path
    from .generator import CorpusSpec, generate_corpus

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    corpus = generate_corpus(CorpusSpec(**_SPEC))
    media = corpus["media"][["media_ref", "image_bytes"]]
    tmp = tempfile.mktemp(dir=FIXTURE_DIR, suffix=".parquet.tmp")
    media.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path
