"""CLI entry point: ``python -m img2dataset_spark --url_list ... ``.

Mirrors the reference's fire-based CLI (reference main.py:277-278:
``fire.Fire(main)`` exposing the download() signature).  fire is not a
dependency here; instead argv is mapped onto PipelineConfig fields by
name with types coerced from the dataclass annotations — the accepted
flag surface is therefore exactly the config surface.

Supported argv forms (fire-compatible): ``--key value``, ``--key=value``.
Booleans accept true/false/1/0 or bare ``--flag`` for True.  None is
spelled ``null`` or ``none``.  List values are comma-separated.
"""

from __future__ import annotations

import sys
from dataclasses import fields

from img2dataset_spark.config import PipelineConfig


def _coerce(name: str, raw: str, annotation: str):
    """Coerce a CLI string to the config field's annotated type."""
    ann = annotation.replace(" ", "")
    if raw.lower() in ("null", "none"):
        if "None" not in ann:
            raise SystemExit(f"--{name} does not accept null")
        return None
    if ann.startswith("bool"):
        if raw.lower() in ("true", "1", "yes"):
            return True
        if raw.lower() in ("false", "0", "no"):
            return False
        raise SystemExit(f"--{name} expects true/false, got {raw!r}")
    if ann.startswith("int"):
        return int(raw)
    if ann.startswith("float"):
        return float(raw)
    if ann.startswith("list[str]"):
        return [s for s in raw.split(",") if s]
    if ann.startswith("tuple[str,str]"):
        parts = raw.split(",")
        if len(parts) != 2:
            raise SystemExit(f"--{name} expects 'column,algorithm'")
        return (parts[0], parts[1])
    if ann.startswith("tuple[str,...]"):
        return tuple(s for s in raw.split(",") if s)
    return raw  # str


def parse_args(argv: list[str]) -> PipelineConfig:
    field_by_name = {f.name: f for f in fields(PipelineConfig)}
    kwargs: dict[str, object] = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise SystemExit(f"unexpected positional argument {arg!r}")
        key = arg[2:]
        if "=" in key:
            key, raw = key.split("=", 1)
            i += 1
        elif i + 1 < len(argv) and not argv[i + 1].startswith("--"):
            raw = argv[i + 1]
            i += 2
        else:
            raw = "true"  # bare boolean flag
            i += 1
        key = key.replace("-", "_")
        if key in ("help", "h"):
            _print_help()
            raise SystemExit(0)
        f = field_by_name.get(key)
        if f is None:
            raise SystemExit(
                f"unknown option --{key}; valid options: "
                + ", ".join(sorted(field_by_name))
            )
        kwargs[key] = _coerce(key, raw, str(f.type))
    if "url_list" not in kwargs:
        raise SystemExit("--url_list is required")
    return PipelineConfig(**kwargs)


def _print_help() -> None:
    print("usage: python -m img2dataset_spark --url_list PATH [--option value ...]")
    print("options (defaults in parentheses):")
    for f in fields(PipelineConfig):
        print(f"  --{f.name} ({f.default!r})")


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("--help", "-h", "help"):
        _print_help()
        return 0
    cfg = parse_args(argv)
    from img2dataset_spark.plans.pipeline import download

    stats = download(cfg)
    total = sum(r["count"] for r in stats)
    ok = sum(r["successes"] for r in stats)
    print(f"done: {len(stats)} shard(s), {ok}/{total} success")
    return 0


if __name__ == "__main__":
    sys.exit(main())
