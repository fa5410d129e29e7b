"""HuggingFace Hub integration (S7/S8 in SURVEY.md §2.1).

Reference: src/hf_ops.rs. Reproduced contract:

* ``hf://user/repo`` model URIs resolve to a metadata.json with
  ``letsearch_version == 1``, ``variants: [{variant, path}]`` and
  ``required_files`` (hf_ops.rs:193-239);
* download picks the requested variant's file + every required file,
  caches under ``~/.letsearch_spark/models/<org>/<repo>`` and skips
  files that already exist (hf_ops.rs:102-171 skip-if-exists);
* ``list_models`` hits ``GET /api/models?filter=letsearch`` and sorts
  by downloads desc (hf_ops.rs:257-289);
* ``hf://datasets/...`` *data* paths map to the public resolve URL, the
  moral equivalent of DuckDB httpfs resolving them inside read_json_auto
  (S1, collection_actor.rs:171-174).

All network access goes through an injectable ``fetch`` callable
(default: urllib) so every code path is testable offline. Downloads are
driver-side; the model directory is then shipped to executors via
SparkContext.addFile or a shared filesystem (the UDF factory in
embedders/onnx_encoder.py resolves per-process).
"""

from __future__ import annotations

import json
import os
import urllib.request

HF_BASE = "https://huggingface.co"
LETSEARCH_VERSION = 1


def cache_root() -> str:
    return os.environ.get(
        "LETSEARCH_SPARK_HOME", os.path.expanduser("~/.letsearch_spark")
    )


def _default_fetch(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=120) as resp:
        return resp.read()


def parse_hf_uri(uri: str) -> str:
    """'hf://org/repo' -> 'org/repo' (validation only)."""
    if not uri.startswith("hf://"):
        raise ValueError(f"not an hf:// uri: {uri}")
    repo = uri.removeprefix("hf://")
    if repo.count("/") != 1 or not all(repo.split("/")):
        raise ValueError(f"expected hf://org/repo, got {uri}")
    return repo


def dataset_url(uri: str, revision: str = "main") -> str:
    """Map an ``hf://datasets/org/name/file`` data path to the public
    resolve URL (what DuckDB httpfs does for the reference's S1/S2)."""
    if not uri.startswith("hf://datasets/"):
        raise ValueError(f"not an hf://datasets/ uri: {uri}")
    rest = uri.removeprefix("hf://datasets/")
    # org/name/file... -> first two segments are the repo
    parts = rest.split("/")
    if len(parts) < 3:
        raise ValueError(f"expected hf://datasets/org/name/path, got {uri}")
    repo = "/".join(parts[:2])
    path = "/".join(parts[2:])
    return f"{HF_BASE}/datasets/{repo}/resolve/{revision}/{path}"


def validate_metadata(meta: dict) -> None:
    """metadata.json contract (hf_ops.rs:193-239)."""
    if meta.get("letsearch_version") != LETSEARCH_VERSION:
        raise ValueError(
            f"unsupported letsearch_version: {meta.get('letsearch_version')!r}"
        )
    if not isinstance(meta.get("variants"), list) or not meta["variants"]:
        raise ValueError("metadata.json has no variants")


def pick_variant(meta: dict, variant: str) -> str:
    """Return the model file path for the requested variant."""
    for v in meta["variants"]:
        if v.get("variant") == variant:
            return v["path"]
    raise ValueError(
        f"variant {variant!r} not in {[v.get('variant') for v in meta['variants']]}"
    )


def download_model(
    uri: str, variant: str = "f32", token: str | None = None, fetch=None
) -> tuple[str, str]:
    """Resolve + download an hf:// model (hf_ops.rs:173-255).

    Returns (model_dir, model_file). Skips files that already exist in
    the cache (hf_ops.rs:140-147)."""
    fetch = fetch or _default_fetch
    repo = parse_hf_uri(uri)
    target = os.path.join(cache_root(), "models", repo)
    os.makedirs(target, exist_ok=True)

    meta_path = os.path.join(target, "metadata.json")
    if not os.path.exists(meta_path):
        raw = fetch(f"{HF_BASE}/{repo}/resolve/main/metadata.json")
        with open(meta_path, "wb") as f:
            f.write(raw)
    with open(meta_path) as f:
        meta = json.load(f)
    validate_metadata(meta)

    model_rel = pick_variant(meta, variant)
    wanted = [model_rel] + list(meta.get("required_files", []))
    for rel in wanted:
        dst = os.path.join(target, rel)
        if os.path.exists(dst):  # skip-if-exists
            continue
        os.makedirs(os.path.dirname(dst) or target, exist_ok=True)
        with open(dst, "wb") as f:
            f.write(fetch(f"{HF_BASE}/{repo}/resolve/main/{rel}"))
    return target, os.path.join(target, model_rel)


def resolve_data_path(path: str, fetch=None) -> str:
    """Resolve a data path for ingest (S1/S2): local paths/globs pass
    through; ``hf://datasets/org/name/file`` is downloaded once into the
    cache (the reference delegates this to DuckDB httpfs,
    collection_actor.rs:171-174) and the local path returned."""
    if not path.startswith("hf://"):
        return path
    fetch = fetch or _default_fetch
    url = dataset_url(path)
    rel = path.removeprefix("hf://datasets/")
    dst = os.path.join(cache_root(), "datasets", rel)
    if not os.path.exists(dst):  # skip-if-exists, like model downloads
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "wb") as f:
            f.write(fetch(url))
    return dst


def list_models(token: str | None = None, fetch=None) -> list[dict]:
    """GET /api/models?filter=letsearch, sorted by downloads desc
    (hf_ops.rs:257-289)."""
    fetch = fetch or _default_fetch
    raw = fetch(f"{HF_BASE}/api/models?filter=letsearch")
    models = json.loads(raw)
    return sorted(models, key=lambda m: m.get("downloads", 0), reverse=True)
