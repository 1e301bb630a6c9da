"""Every on-disk artifact must be served through an ATOMIC guard.

The llm_image_dedup_index poisoning (round 13's one sweep failure): a
killed build left an empty bands/ dir and a bare isdir() guard served it
forever. The mechanical invariant: every function that derives an
artifact path from _sf_cache_dir must gate its read path on one of the
atomic completion markers —

* ``_SUCCESS``   — Spark's own commit marker (written last by the
                   parquet committer);
* ``_DONE`` / ``_built`` — a marker written INSIDE a process-unique
                   build dir before one atomic os.rename promotes the
                   whole dir;
* ``_json_sidecar_read`` — atomic tmp+rename JSON whose corrupt/partial
                   reads degrade to a miss;
* ``snapshot_versions`` — the sinks/snapshots manifest protocol (a
                   version is visible only after the pointer flip).

A bare ``os.path.isdir`` / ``os.path.exists`` on a data file is exactly
the poisonable pattern and fails this test. ARTIFACTS.md carries the
matching human-readable manifest (builder + measured cold cost per
artifact)."""

from __future__ import annotations

import ast
import os

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "crowdsorsa_etl_spark")

_ATOMIC_MARKERS = (
    "_SUCCESS",
    "_DONE",
    "_built",
    "_json_sidecar_read",
    "snapshot_versions",
)


def _functions_using_cache_dir():
    """Yield (file, funcname, source_segment) for every function whose
    body calls _sf_cache_dir."""
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            with open(path) as fh:
                src = fh.read()
            if "_sf_cache_dir(" not in src:
                continue
            tree = ast.parse(src)
            for node in ast.walk(tree):
                if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    continue
                seg = ast.get_source_segment(src, node) or ""
                if "_sf_cache_dir(" in seg and "def _sf_cache_dir" not in seg:
                    yield (
                        os.path.relpath(path, os.path.dirname(PKG)),
                        node.name,
                        seg,
                    )


def test_every_artifact_reader_is_atomically_guarded():
    found = list(_functions_using_cache_dir())
    assert found, "no _sf_cache_dir users found — test wiring broken"
    bad = []
    for path, name, seg in found:
        if not any(m in seg for m in _ATOMIC_MARKERS):
            bad.append(f"{path}::{name}")
    assert not bad, (
        "artifact readers without an atomic completion guard "
        f"(_SUCCESS/_DONE/_json_sidecar_read): {bad}"
    )


def test_no_bare_isdir_guard_on_artifact_paths():
    """isdir() alone cannot distinguish a finished artifact from a killed
    build's husk; any isdir in an artifact function must be accompanied
    by an atomic marker check in the same function (the markers test
    above guarantees one exists — this pins the specific regression)."""
    for path, name, seg in _functions_using_cache_dir():
        if "os.path.isdir(" in seg:
            assert any(m in seg for m in _ATOMIC_MARKERS), (
                f"{path}::{name} guards an artifact with bare isdir()"
            )


def test_manifest_covers_every_artifact_tag():
    """ARTIFACTS.md must list every _sf_cache_dir tag used in the
    package (the manifest is the cold-cost contract a fresh sandbox
    reads before its first sweep)."""
    import re

    repo = os.path.dirname(PKG)
    with open(os.path.join(repo, "ARTIFACTS.md")) as fh:
        manifest = fh.read()
    tags = set()
    for _path, _name, seg in _functions_using_cache_dir():
        for m in re.finditer(r"_sf_cache_dir\(\s*[^,]+,\s*(f?)(['\"])(.+?)\2", seg):
            tag = m.group(3)
            tag = re.sub(r"\{[^}]*\}", "*", tag)  # f-string fields -> glob
            tags.add(tag)
    missing = sorted(t for t in tags if t.split("*")[0] not in manifest)
    assert not missing, f"artifact tags missing from ARTIFACTS.md: {missing}"


def test_promote_stage_evicts_markerless_husk(tmp_path):
    """The ADVICE r14 medium: os.rename(stage, path) fails ENOTEMPTY
    when an old marker-less cache dir occupies path — the loser branch
    must evict the husk and retry, not discard the fresh build while the
    husk is served forever."""
    from crowdsorsa_etl_spark.queries._shared import _promote_stage

    path = tmp_path / "idx"
    stage = tmp_path / "idx.stage.123"
    # pre-existing husk: data but NO completion marker
    path.mkdir()
    (path / "part-0").write_text("stale")
    stage.mkdir()
    (stage / "part-0").write_text("fresh")
    (stage / "_built").write_text("")
    _promote_stage(str(stage), str(path), marker="_built")
    assert (path / "_built").exists()
    assert (path / "part-0").read_text() == "fresh"
    assert not stage.exists()


def test_promote_stage_respects_complete_winner(tmp_path):
    """When the occupant IS complete (a concurrent builder won), the
    loser discards its stage and the winner's bytes are served."""
    from crowdsorsa_etl_spark.queries._shared import _promote_stage

    path = tmp_path / "idx"
    stage = tmp_path / "idx.stage.456"
    path.mkdir()
    (path / "part-0").write_text("winner")
    (path / "_SUCCESS").write_text("")
    stage.mkdir()
    (stage / "part-0").write_text("loser")
    (stage / "_SUCCESS").write_text("")
    _promote_stage(str(stage), str(path))
    assert (path / "part-0").read_text() == "winner"
    assert not stage.exists()


def test_promote_stage_clean_first_promotion(tmp_path):
    from crowdsorsa_etl_spark.queries._shared import _promote_stage

    path = tmp_path / "idx"
    stage = tmp_path / "idx.stage.789"
    stage.mkdir()
    (stage / "_SUCCESS").write_text("")
    _promote_stage(str(stage), str(path))
    assert (path / "_SUCCESS").exists() and not stage.exists()
