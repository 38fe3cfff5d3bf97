"""Pipeline configuration — the engine's public "query".

Mirrors the knob surface of the reference CLI (`/root/reference/
img2dataset/main.py:73-112`) and its validation rules
(`main.py:31-70`).  A `PipelineConfig` is declarative: `plans.pipeline`
lowers it to a lazy DataFrame plan that Catalyst optimizes.

Reference knobs deliberately absent, with their Spark replacement:
  processes_count / thread_count topology  -> executor/core counts are
      cluster config, not query config (thread_count survives as the
      per-task fetch concurrency knob);
  distributor                              -> the Spark scheduler IS
      the distributor (SURVEY §2.4);  subjob_size survives as the R2
      wave knob: shards are processed in bounded batches, each its own
      Spark job with its own incremental commit + retry scope
      (distributor.py:50-58) — at 100 TB this bounds the in-flight
      fetch/decode state and makes progress restartable per wave;
  enable_wandb / wandb_project             -> no external telemetry
      service; the stats sidecars + streaming/progress.py aggregation
      are the engine-native equivalent.
Spark-side extras: fetch_mode (hermetic mock fetch for tests/oracles),
ordered_sharding (global contiguous ids vs cheaper hash mode),
shuffle_partitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Reserved output-namespace columns users may not supply as additional
# columns (reference main.py:45-70).
RESERVED_COLUMNS = frozenset(
    [
        "key",
        "caption",
        "url",
        "width",
        "height",
        "original_width",
        "original_height",
        "status",
        "error_message",
        "exif",
        "md5",
        "sha256",
        "sha512",
    ]
)

HASH_ALGORITHMS = ("md5", "sha256", "sha512")

INPUT_FORMATS = (
    "txt",
    "txt.gz",
    "csv",
    "csv.gz",
    "tsv",
    "tsv.gz",
    "json",
    "json.gz",
    "jsonl",
    "jsonl.gz",
    "parquet",
)

OUTPUT_FORMATS = ("files", "webdataset", "parquet", "tfrecord", "dummy")

# "aspect_bucket" is beyond-reference (operators/aspect.py): resize to
# the nearest equal-area aspect bucket (scale-to-cover + center-crop)
# so same-bucket rows share one tensor shape — the SDXL training recipe.
RESIZE_MODES = (
    "no", "keep_ratio", "keep_ratio_largest", "center_crop", "border",
    "aspect_bucket",
)

ENCODE_FORMATS = ("jpg", "png", "webp")

# Default disallowed X-Robots-Tag directives (reference main.py:114-117).
DEFAULT_DISALLOWED_HEADER_DIRECTIVES = ("noai", "noimageai", "noindex", "noimageindex")

INCREMENTAL_MODES = ("incremental", "overwrite", "extend")


@dataclass
class PipelineConfig:
    """All knobs of the reference `download()` signature (main.py:73-112),
    plus engine-specific additions marked [spark]."""

    url_list: str = ""
    output_folder: str = "images"
    input_format: str = "txt"
    url_col: str = "url"
    caption_col: str | None = None
    bbox_col: str | None = None
    output_format: str = "files"
    image_size: int = 256
    resize_mode: str = "border"
    resize_only_if_bigger: bool = False
    upscale_interpolation: str = "lanczos"
    downscale_interpolation: str = "area"
    encode_quality: int = 95
    encode_format: str = "jpg"
    skip_reencode: bool = False
    number_sample_per_shard: int = 10000
    oom_shard_count: int = 5
    save_additional_columns: list[str] | None = None
    extract_exif: bool = False
    verify_hash: tuple[str, str] | None = None  # (column, algorithm)
    compute_hash: str | None = "sha256"
    # 64-bit perceptual hash of the STORED payload (functions/phash.py)
    # as a metadata long column — enables pixel-level near-dup dedup of
    # the written corpus (dedup.hamming_pairs64 over the metadata
    # parquet), which byte hashing cannot do.  NULL when the payload is
    # absent or undecodable (incl. mock-fetch payloads).  Beyond the
    # reference's surface (its hashes are byte-level: downloader.py
    # compute_hash).
    compute_phash: bool = False
    timeout: int = 10
    retries: int = 0
    user_agent_token: str | None = None
    disallowed_header_directives: tuple[str, ...] | None = (
        DEFAULT_DISALLOWED_HEADER_DIRECTIVES
    )
    ignore_ssl_certificate: bool = False
    thread_count: int = 256
    min_image_size: int = 0
    max_image_area: float = float("inf")
    max_aspect_ratio: float = float("inf")
    incremental_mode: str = "incremental"
    max_shard_retry: int = 1
    # R2: shards per subjob wave (distributor.py:45-58; reference default
    # 1000).  None = one job over all shards (Spark schedules everything).
    subjob_size: int | None = None
    disable_all_reencoding: bool = False
    # [spark] engine knobs
    shuffle_partitions: int | None = None
    fetch_mode: str = "http"  # "http" | "mock" (deterministic, hermetic)
    ordered_sharding: bool = True  # exact contiguous shard ids (global sort)
    # [spark] pre-fetch canonical-URL dedup (functions/url.py): drop rows
    # whose canonicalized URL duplicates an earlier row BEFORE sharding —
    # every duplicate caught here is an HTTP fetch + decode + store never
    # paid.  Off by default: the reference fetches every input row.
    dedup_urls: bool = False

    def __post_init__(self) -> None:
        self.validate()

    def validate(self) -> None:
        """Reference-equivalent validation (main.py:31-70,120)."""
        if self.input_format not in INPUT_FORMATS:
            raise ValueError(f"Invalid input format {self.input_format}")
        if self.output_format not in OUTPUT_FORMATS:
            raise ValueError(f"Invalid output format {self.output_format}")
        if self.resize_mode not in RESIZE_MODES:
            raise ValueError(f"Invalid resize mode {self.resize_mode}")
        if self.encode_format not in ENCODE_FORMATS:
            raise ValueError(f"Invalid encode format {self.encode_format}")
        if self.incremental_mode not in INCREMENTAL_MODES:
            raise ValueError(f"Invalid incremental mode {self.incremental_mode}")
        if self.fetch_mode not in ("http", "mock"):
            raise ValueError(f"Invalid fetch mode {self.fetch_mode}")
        if self.compute_hash is not None and self.compute_hash not in HASH_ALGORITHMS:
            raise ValueError(f"Invalid hash {self.compute_hash}")
        if self.verify_hash is not None:
            _, alg = self.verify_hash
            if alg not in HASH_ALGORITHMS:
                raise ValueError(f"Invalid verify hash algorithm {alg}")
        if self.save_additional_columns:
            clashes = RESERVED_COLUMNS.intersection(self.save_additional_columns)
            if clashes:
                raise ValueError(
                    f"additional columns clash with reserved namespace: {sorted(clashes)}"
                )
        if self.timeout <= 0:
            raise ValueError("timeout must be > 0")
        if self.number_sample_per_shard <= 0:
            raise ValueError("number_sample_per_shard must be > 0")
        if self.subjob_size is not None and self.subjob_size <= 0:
            raise ValueError("subjob_size must be > 0")

    @property
    def hash_columns(self) -> list[str]:
        """Hash columns present in output metadata."""
        cols = []
        if self.verify_hash is not None:
            cols.append(self.verify_hash[1])
        if self.compute_hash is not None and self.compute_hash not in cols:
            cols.append(self.compute_hash)
        return cols
