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


_PHASH_SPEC = dict(n_images=48, seed=23, n_flat=18)
_PHASH_NAME = "phash_" + "_".join(f"{k}{v}" for k, v in sorted(_PHASH_SPEC.items())) + ".parquet"


def phash_fixture_path() -> str:
    """Write-once fixture for the perceptual-hash image-dedup family:
    (media_ref, image_bytes, width, height, gray_pixels) where
    image_bytes is a LOSSLESS gray PNG of exactly gray_pixels
    (row-major uint8 list). The Spark queries DECODE image_bytes with
    the real decoder and never read gray_pixels; the DuckDB oracle
    recomputes the hash from gray_pixels — so oracle parity proves the
    integer dHash arithmetic in both engines AND decode(encode(x)) == x
    on the real byte path. (JPEG is excluded by design: lossy decode
    output != source pixels, and JPEG decode correctness has its own
    golden tests.)

    Content: structured base images (gradient + seeded rectangles);
    every third image is a near-duplicate of its predecessor (small
    seeded pixel perturbation -> a few flipped dHash bits, landing
    within the Hamming join threshold); plus a family of n_flat
    near-flat images whose degenerate all-zero bands exercise the
    hot-band cap."""
    path = os.path.join(FIXTURE_DIR, _PHASH_NAME)
    if os.path.exists(path):
        return path
    import numpy as np
    import pandas as pd

    from .png import encode_gray_png

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rows = []
    prev = None
    for ii in range(_PHASH_SPEC["n_images"]):
        rng = np.random.Generator(np.random.PCG64(_PHASH_SPEC["seed"] * 1000 + ii))
        if ii % 3 == 2 and prev is not None:
            img = prev.astype(np.int64)
            # sparse +-8 perturbation on ~2% of pixels + small uniform
            # brightness shift: flips only a handful of dHash bits
            mask = rng.random(img.shape) < 0.02
            img = img + mask * rng.integers(-8, 9, img.shape) + int(rng.integers(-3, 4))
            img = np.clip(img, 0, 255).astype(np.uint8)
        else:
            w = int(rng.integers(48, 160))
            h = int(rng.integers(40, 128))
            yy, xx = np.mgrid[0:h, 0:w]
            img = ((xx * 255) // max(w - 1, 1) // 2 + (yy * 255) // max(h - 1, 1) // 2).astype(
                np.uint8
            )
            for _ in range(int(rng.integers(2, 6))):
                x0, y0 = int(rng.integers(0, w - 8)), int(rng.integers(0, h - 8))
                bw, bh = int(rng.integers(4, w - x0)), int(rng.integers(4, h - y0))
                img[y0 : y0 + bh, x0 : x0 + bw] = int(rng.integers(0, 256))
        prev = img
        rows.append(
            {
                "media_ref": f"img/page{ii:03d}.png",
                "image_bytes": encode_gray_png(img),
                "width": img.shape[1],
                "height": img.shape[0],
                "gray_pixels": img.ravel().astype(np.int64).tolist(),
            }
        )
    for fi in range(_PHASH_SPEC["n_flat"]):
        # constant gray -> every band 0, i.e. one degenerate hot band
        # bucket shared by all n_flat images
        w, h = 64, 48
        img = np.full((h, w), 128 + (fi % 3), dtype=np.uint8)
        rows.append(
            {
                "media_ref": f"img/flat{fi:03d}.png",
                "image_bytes": encode_gray_png(img),
                "width": w,
                "height": h,
                "gray_pixels": img.ravel().astype(np.int64).tolist(),
            }
        )
    tmp = tempfile.mktemp(dir=FIXTURE_DIR, suffix=".parquet.tmp")
    pd.DataFrame(rows).to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


_AUDIO_SPEC = dict(n_clips=24, seed=11, max_n=3500)
_AUDIO_NAME = "audio_" + "_".join(f"{k}{v}" for k, v in sorted(_AUDIO_SPEC.items())) + ".parquet"


def audio_fixture_path() -> str:
    """Write-once (media_ref, image_bytes) fixture of canonical-layout
    PCM WAV clips (fixtures/wav.py encoder: 44-byte header, fmt at
    byte 12, data at 36 — the shape the DuckDB oracle's fixed hex
    offsets assume; the Spark decoder does a real chunk walk and is
    tested on non-canonical layouts separately). The opaque-bytes
    column keeps the media-table convention name `image_bytes`.
    Mixed sample rates / widths / channel counts; deterministic
    sine+noise payloads."""
    path = os.path.join(FIXTURE_DIR, _AUDIO_NAME)
    if os.path.exists(path):
        return path
    import numpy as np
    import pandas as pd

    from .wav import encode_wav

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rows = []
    rates = [8000, 16000, 22050, 44100]
    for ci in range(_AUDIO_SPEC["n_clips"]):
        rng = np.random.Generator(np.random.PCG64(_AUDIO_SPEC["seed"] * 1000 + ci))
        rate = rates[ci % len(rates)]
        ch = 1 + (ci % 2)
        bits = 16 if ci % 3 else 8
        n = int(rng.integers(600, _AUDIO_SPEC["max_n"]))
        t = np.arange(n)[:, None]
        tone = np.sin(2 * np.pi * (220 + 20 * ci) * t / rate)
        noise = rng.normal(0, 0.05, size=(n, ch))
        x = tone + noise
        if bits == 16:
            s = np.clip(np.round(x * 20000), -32768, 32767).astype(np.int64)
        else:
            s = np.clip(np.round(x * 100) + 128, 0, 255).astype(np.int64)
        rows.append(
            {"media_ref": f"audio/clip{ci:03d}.wav", "image_bytes": encode_wav(s, rate, bits=bits)}
        )
    tmp = tempfile.mktemp(dir=FIXTURE_DIR, suffix=".parquet.tmp")
    pd.DataFrame(rows).to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


_VIDEO_SPEC = dict(n_videos=8, seed=13)
_VIDEO_NAME = "video_" + "_".join(f"{k}{v}" for k, v in sorted(_VIDEO_SPEC.items())) + ".parquet"


def video_fixture_path() -> str:
    """Write-once (media_ref, image_bytes) fixture of MJPEG-AVI clips
    (fixtures/avi.py; frames encoded by the in-repo JPEG codec).
    Canonical header layout (avih at byte 24) for the oracle's fixed
    hex offsets."""
    path = os.path.join(FIXTURE_DIR, _VIDEO_NAME)
    if os.path.exists(path):
        return path
    import numpy as np
    import pandas as pd

    from .avi import encode_mjpeg_avi
    from .jpeg import encode_gray_jpeg

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rows = []
    for vi in range(_VIDEO_SPEC["n_videos"]):
        rng = np.random.Generator(np.random.PCG64(_VIDEO_SPEC["seed"] * 1000 + vi))
        w, h = 16 * int(rng.integers(3, 7)), 16 * int(rng.integers(2, 5))
        n_frames = int(rng.integers(3, 12))
        fps = [10, 12, 24, 25][vi % 4]
        base = rng.integers(0, 64)
        frames = []
        for fi in range(n_frames):
            yy, xx = np.mgrid[0:h, 0:w]
            img = ((xx * 2 + yy + base + fi * 7) % 256).astype(np.uint8)
            frames.append(encode_gray_jpeg(img))
        rows.append(
            {
                "media_ref": f"video/clip{vi:03d}.avi",
                "image_bytes": encode_mjpeg_avi(frames, w, h, fps=fps),
            }
        )
    tmp = tempfile.mktemp(dir=FIXTURE_DIR, suffix=".parquet.tmp")
    pd.DataFrame(rows).to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


_TAR_SPEC = dict(n_shards=6, samples_per_shard=8, seed=99)
_TAR_DIRNAME = "wds_" + "_".join(f"{k}{v}" for k, v in sorted(_TAR_SPEC.items()))


def tar_fixture_dir() -> str:
    """Write-once WebDataset fixture: ``n_shards`` tar shards of
    multi-component samples (a PNG page, a caption .txt, sometimes a
    .json sidecar) plus ``manifest.parquet`` with one row per member
    (shard, member, n_bytes, md5hex) computed from the SOURCE payloads
    BEFORE tar-ing — so the oracle manifest is independent of both the
    stdlib tar writer and the from-scratch ustar parser under test."""
    import hashlib
    import io
    import json
    import tarfile

    out_dir = os.path.join(FIXTURE_DIR, _TAR_DIRNAME)
    done = os.path.join(out_dir, "manifest.parquet")
    if os.path.exists(done):
        return out_dir
    import numpy as np
    import pandas as pd

    from .generator import _VOCAB
    from .png import encode_gray_png

    os.makedirs(out_dir, exist_ok=True)
    manifest = []
    for si in range(_TAR_SPEC["n_shards"]):
        rng = np.random.Generator(np.random.PCG64(_TAR_SPEC["seed"] * 100 + si))
        shard = f"shard-{si:04d}.tar"
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for ki in range(_TAR_SPEC["samples_per_shard"]):
                key = f"{si:04d}{ki:04d}"
                h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
                img = (rng.integers(0, 256, size=(h, w))).astype("uint8")
                words = [
                    _VOCAB[int(i)]
                    for i in rng.integers(0, len(_VOCAB), int(rng.integers(3, 9)))
                ]
                members = [
                    (f"{key}.png", encode_gray_png(img)),
                    (f"{key}.txt", " ".join(words).encode()),
                ]
                if rng.random() < 0.5:
                    members.append(
                        (f"{key}.json", json.dumps({"k": key, "h": h, "w": w}).encode())
                    )
                for name, payload in members:
                    info = tarfile.TarInfo(name=name)
                    info.size = len(payload)
                    info.mtime = 0  # deterministic bytes
                    tf.addfile(info, io.BytesIO(payload))
                    manifest.append(
                        {
                            "shard": shard,
                            "member": name,
                            "n_bytes": len(payload),
                            "md5hex": hashlib.md5(payload).hexdigest(),
                        }
                    )
        with open(os.path.join(out_dir, shard), "wb") as f:
            f.write(buf.getvalue())
    tmp = tempfile.mktemp(dir=out_dir, suffix=".parquet.tmp")
    pd.DataFrame(manifest).to_parquet(tmp, index=False)
    os.replace(tmp, done)
    return out_dir
