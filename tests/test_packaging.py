"""Packaging contract: pyproject console-script targets resolve and the
repo-root tool shims stay wired to the package implementations
(VERDICT r2 item 9 — the reference ships only requirements.txt,
ref: requirements.txt:1-17)."""

import importlib
import tomllib
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_console_script_targets_resolve():
    with open(ROOT / "pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    scripts = meta["project"]["scripts"]
    assert {"ttr-train", "ttr-serve", "ttr-build-index"} <= set(scripts)
    for name, target in scripts.items():
        module, func = target.split(":")
        obj = getattr(importlib.import_module(module), func)
        assert callable(obj), f"{name} -> {target} is not callable"


def test_root_tool_shims_import_package_mains():
    for shim in ("build_index", "download_dataset", "prepare_embeddings"):
        src = (ROOT / "tools" / f"{shim}.py").read_text()
        assert f"twotowermlretrieval_tpu.tools.{shim}" in src


def test_package_dependencies_importable():
    """Everything in [project.dependencies] is available in this env."""
    with open(ROOT / "pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    for dep in meta["project"]["dependencies"]:
        mod = dep.split(">=")[0].split("==")[0].strip()
        mod = {"orbax-checkpoint": "orbax.checkpoint"}.get(mod, mod)
        importlib.import_module(mod)


def test_inspect_data_console_script_exit_status(synth_dir):
    """The ttr-inspect-data wrapper runs sys.exit(cli()); cli() must
    return an int exit status (main() returns the report dict for
    library/test callers, which sys.exit would treat as failure)."""
    import io
    import sys
    from contextlib import redirect_stdout

    import twotowermlretrieval_tpu.tools.inspect_data as mod

    argv = sys.argv
    sys.argv = ["ttr-inspect-data", "--data-dir", str(synth_dir),
                "--suggest-buckets", "2", "--json"]
    try:
        with redirect_stdout(io.StringIO()):
            rc = mod.cli()
    finally:
        sys.argv = argv
    assert rc == 0


def test_hostprobe_shared_by_bench_and_graft_entry():
    """bench.py and __graft_entry__ both use the one subprocess probe
    (review finding: two hand-rolled copies drift independently)."""
    from twotowermlretrieval_tpu.hostprobe import probe_default_backend

    # pin the child to cpu: the default backend is the remote relay, whose
    # health this unit test must not depend on
    platform, count = probe_default_backend(timeout_s=120.0, platform="cpu")
    assert platform == "cpu" and count >= 1
    for consumer in (ROOT / "bench.py", ROOT / "__graft_entry__.py"):
        assert "hostprobe" in consumer.read_text()


def test_hostprobe_failure_is_graceful(monkeypatch):
    import twotowermlretrieval_tpu.hostprobe as hp

    monkeypatch.setattr(hp.sys, "executable", "/nonexistent/python")
    platform, count, diag = hp.probe_default_backend_verbose(timeout_s=5.0)
    assert (platform, count) == ("", 0) and diag


def test_version_consistent():
    import twotowermlretrieval_tpu as pkg

    with open(ROOT / "pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["version"] == pkg.__version__
