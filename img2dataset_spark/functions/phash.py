"""Perceptual image hashing (pHash) for near-duplicate IMAGE dedup.

The reference pipeline dedups nothing at the pixel level — it hashes
raw BYTES (md5/sha, `/root/reference/img2dataset/downloader.py`
compute_hash), so a re-encoded, resized, or slightly-recompressed copy
of the same photo passes as a distinct image.  At crawl scale the same
picture circulates in dozens of such spellings; pHash is the standard
answer: a 64-bit signature of the image's low-frequency structure,
stable under re-encode/resize/small edits, compared by Hamming
distance.

Recipe (deterministic, dependency-free — documented because it IS the
contract; we do not chase any third-party library bit-for-bit since
none is installed here):

  1. decode (the repo's pure-Python codecs: PNG/JPEG/GIF/BMP/VP8L),
  2. luma gray = 0.299 R + 0.587 G + 0.114 B (float64, no truncation),
  3. area-resize to 32 x 32 (functions/resample.py exact fractional
     coverage — shrink-dominant, the right kernel for hashing),
  4. orthonormal 2-D DCT-II, keep the top-left 8 x 8 block,
  5. bit_i = coefficient_i > median(all 64 coefficients),
  6. pack 64 bits MSB-first into one signed int64 (two's complement,
     so it rides a Spark `long` column unchanged).

All arithmetic is float64 with a fixed operation order, so the hash is
reproducible across machines.  Pairing at corpus scale lives in
operators/dedup.py `hamming_pairs64` (pigeonhole-banded self-join —
full recall, no quadratic path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n x n): B @ x is the 1-D DCT."""
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    B = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    B[0] /= np.sqrt(2.0)
    return B


_DCT32 = _dct_basis(32)


def to_gray(arr: np.ndarray) -> np.ndarray:
    """(H, W[, C]) uint8/float -> float64 luma.  Alpha is ignored
    (hashing structure, not transparency); gray input passes through."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        return a
    if a.shape[2] == 1:
        return a[:, :, 0]
    return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash of a decoded image array, as a SIGNED
    int64 (two's-complement view of the MSB-first bit string) so it
    stores in a Spark long without loss."""
    from img2dataset_spark.functions.resample import resize

    g = resize(to_gray(arr), 32, 32, mode="area")
    D = _DCT32 @ g @ _DCT32.T
    low = D[:8, :8].ravel()
    bits = low > np.median(low)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= 1 << 63 else v


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two packed signed-int64 hashes."""
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def synth_image(seed: int) -> np.ndarray:
    """Deterministic synthetic photo-ish RGB image for the oracle-
    checked phash registry query: crossed gradients + a seed-keyed
    sinusoid, float64 arithmetic in a fixed order so every machine
    produces identical uint8 pixels.  120 x 90, like a thumbnail."""
    w, h = 120, 90
    x = np.linspace(0.0, 1.0, w)[None, :]
    y = np.linspace(0.0, 1.0, h)[:, None]
    phase = (seed * 0.137) % 1.0
    freq = 4.0 + (seed % 7)
    img = 255.0 * (
        0.45 * x + 0.35 * y + 0.2 * np.sin(freq * (x * y + phase) * 6.2832)
    )
    rgb = np.stack(
        [img, np.roll(img, 3 + seed % 5, axis=1), img[::-1]], axis=2
    )
    return np.clip(rgb, 0.0, 255.0).astype(np.uint8)


def synth_payload_image(doc_id: int) -> np.ndarray:
    """The registry query's image-per-doc rule: most docs get their own
    scene; every doc_id % 10 == 7 is a RESIZED copy of doc_id - 1's
    scene (the near-duplicate pHash must catch and byte hashing
    cannot).  Shared verbatim by queries.q_phash_dedup (Spark side,
    PNG round-tripped through executors) and the oracle's local
    expected-output computation."""
    from img2dataset_spark.functions.resample import resize

    if doc_id % 10 == 7:
        return resize(synth_image(doc_id - 1), 60, 45, mode="area")
    return synth_image(doc_id)


def make_synth_png_udf():
    """doc_id -> PNG bytes of synth_payload_image(doc_id).  The
    registry query's payload generator: encoding runs on EXECUTORS
    through the repo's pure-Python PNG codec, so the oracle-checked
    phash path exercises encode -> decode -> hash end-to-end."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def synth(ids: pd.Series) -> pd.Series:
        from img2dataset_spark.functions.png import encode_png

        return pd.Series(
            [bytearray(encode_png(synth_payload_image(int(i)))) for i in ids]
        )

    return synth


def make_phash_udf():
    """binary image payload -> phash long (NULL when the payload can't
    be decoded).  Arrow-batched; decode uses the repo's pure-Python
    codecs, so this runs on executors with zero imaging deps — the
    same property the pipeline's transform UDF has."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def ph(data: pd.Series) -> pd.Series:
        from img2dataset_spark.functions.image import _codec_decode

        out = []
        for payload in data:
            if payload is None:
                out.append(None)
                continue
            try:
                out.append(phash64(_codec_decode(bytes(payload))))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype="object")

    return ph
