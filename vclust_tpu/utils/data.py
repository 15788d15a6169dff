"""Locate the vendored parity corpus (example/ at the repo root).

The reference ships the same corpus inside its package
(reference MANIFEST.in:3-4); we vendor it so the repo is self-contained,
falling back to the reference checkout only if the vendored copy is gone.
"""
import pathlib

_REPO = pathlib.Path(__file__).resolve().parent.parent.parent
_FALLBACK = pathlib.Path('/root/reference/example')


def example_dir() -> pathlib.Path:
    local = _REPO / 'example'
    return local if local.exists() else _FALLBACK


def example_path(*parts: str) -> str:
    return str(example_dir().joinpath(*parts))
