"""Guard the examples/ scripts against CLI-flag drift.

The example scripts are the documented reproduction path for the paper's
grids (experiments_timeseries.ipynb cells 9/13/15/17/19, the 2-D grids, and
the serve quickstart).  Nothing else executes them in CI, so a renamed or
removed runner flag would rot them silently; this test extracts every
``--flag`` token each script passes and asserts the CLI it invokes still
accepts it (by help-text inspection, no training runs).
"""

import glob
import os
import re

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")

# console-script name (pyproject [project.scripts]) -> argparse main module
CLI_MODULES = {
    "pcgmix-run": "pcgmix_tpu.exp.runner",
    "pcgmix-build": "pcgmix_tpu.data.builder",
    "pcgmix-results": "pcgmix_tpu.exp.results",
    "pcgmix-serve": "pcgmix_tpu.serve",
    "pcgmix-classical": "pcgmix_tpu.classical.__main__",
    "python -m pcgmix_tpu.classical": "pcgmix_tpu.classical.__main__",
}

_help_cache: dict[str, str] = {}


def _help_text(module: str, capsys) -> str:
    if module not in _help_cache:
        import importlib

        mod = importlib.import_module(module)
        with pytest.raises(SystemExit):
            mod.main(["--help"])
        _help_cache[module] = capsys.readouterr().out
    return _help_cache[module]


_FLAG_RE = r"(?<![\w-])--[a-z][a-z0-9-]*"


def _flags_by_cli(script: str) -> dict[str, set]:
    """Map each CLI invoked in the script to the --flags passed TO IT:
    backslash continuations are joined, ``NAME="…"`` variable bundles (the
    $COMMON pattern, possibly multi-line) are expanded into the commands
    that reference them, comments are stripped, and flags are collected per
    command line — so a flag is checked against the parser of the CLI that
    actually receives it, not a union across CLIs."""
    text = open(script).read().replace("\\\n", " ")
    variables = {
        name: val_dq if val_dq is not None else (val_sq or val_bare or "")
        for name, val_dq, val_sq, val_bare in re.findall(
            r'(?m)^\s*(\w+)=(?:"([^"]*)"|\'([^\']*)\'|(\S+))', text)
    }
    out: dict[str, set] = {}
    for line in text.splitlines():
        line = line.split("#", 1)[0]
        line = re.sub(
            r"\$\{?(\w+)\}?", lambda m: variables.get(m.group(1), ""), line)
        for cli in CLI_MODULES:
            if cli in line:
                out.setdefault(cli, set()).update(re.findall(_FLAG_RE, line))
    return out


def test_every_example_flag_is_accepted(capsys):
    scripts = sorted(glob.glob(os.path.join(EXAMPLES, "*.sh")))
    assert scripts, "examples/*.sh missing"
    problems = []
    for script in scripts:
        by_cli = _flags_by_cli(script)
        assert by_cli, f"{script}: no known CLI invocation found"
        for cli, flags in sorted(by_cli.items()):
            help_text = _help_text(CLI_MODULES[cli], capsys)
            accepted = set(re.findall(_FLAG_RE, help_text))
            for flag in sorted(flags - accepted):
                problems.append(f"{os.path.basename(script)}: {flag} not "
                                f"accepted by {cli}")
    assert not problems, "\n".join(problems)


def test_drift_guard_catches_unknown_flag(tmp_path, capsys):
    """The guard itself must fail on a bogus flag even when another CLI in
    the same script would accept it (per-command attribution)."""
    script = tmp_path / "bad.sh"
    script.write_text(
        'COMMON="--num-epochs 2"\n'
        "pcgmix-serve $COMMON --this-flag-does-not-exist x\n"
        "pcgmix-run --num-epochs 2\n"  # accepts --num-epochs: must not mask
    )
    by_cli = _flags_by_cli(str(script))
    assert by_cli["pcgmix-serve"] == {"--num-epochs",
                                      "--this-flag-does-not-exist"}
    help_text = _help_text(CLI_MODULES["pcgmix-serve"], capsys)
    accepted = set(re.findall(_FLAG_RE, help_text))
    assert "--this-flag-does-not-exist" not in accepted


def test_train_quickstart_example_runs(monkeypatch, capsys):
    """examples/train_quickstart.py is the README's first-contact snippet;
    run it for real (no-args synthetic branch, tiny shapes, CPU) so it can
    never rot."""
    path = os.path.join(EXAMPLES, "train_quickstart.py")
    monkeypatch.setattr("sys.argv", [path])
    src = open(path).read()
    exec(compile(src, path, "exec"), {"__name__": "__main__"})
    assert "final test accuracy:" in capsys.readouterr().out
