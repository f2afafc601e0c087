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


def _flags_by_cli(script: str) -> dict[str, set]:
    """Map each CLI invoked in the script to the --flags passed anywhere in
    it (variable-held flag bundles like $COMMON make exact per-command
    attribution impossible in shell; whole-script scope still catches every
    rename/removal)."""
    src = "\n".join(
        line for line in open(script).read().splitlines()
        if not line.lstrip().startswith("#")
    )
    clis = {name for name in CLI_MODULES if name in src}
    flags = set(re.findall(r"(?<![\w-])--[a-z][a-z0-9-]*", src))
    return {cli: flags for cli in clis}


def test_every_example_flag_is_accepted(capsys):
    scripts = sorted(glob.glob(os.path.join(EXAMPLES, "*.sh")))
    assert scripts, "examples/*.sh missing"
    problems = []
    for script in scripts:
        by_cli = _flags_by_cli(script)
        assert by_cli, f"{script}: no known CLI invocation found"
        helps = [_help_text(CLI_MODULES[cli], capsys) for cli in by_cli]
        for flag in sorted(set().union(*by_cli.values())):
            if not any(flag in h for h in helps):
                problems.append(f"{os.path.basename(script)}: {flag} not in "
                                f"--help of {sorted(by_cli)}")
    assert not problems, "\n".join(problems)


def test_train_quickstart_example_runs(monkeypatch, capsys):
    """examples/train_quickstart.py is the README's first-contact snippet;
    run it for real (no-args synthetic branch, tiny shapes, CPU) so it can
    never rot."""
    path = os.path.join(EXAMPLES, "train_quickstart.py")
    monkeypatch.setattr("sys.argv", [path])
    src = open(path).read()
    exec(compile(src, path, "exec"), {"__name__": "__main__"})
    assert "final test accuracy:" in capsys.readouterr().out
