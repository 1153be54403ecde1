#!/usr/bin/env python3
"""Mechanized changed-expression detection for the driver-window cut.

The round-10 window re-cut hand-enumerated "queries changed this round"
and missed a whole commit's worth of oracle rewrites while claiming full
coverage (VERDICT r10 item 2). This script removes the human from that
loop: it compares every registered query's ENGINE EXPRESSION (the
registered function's source, docstring/comments stripped via AST so
doc-only edits don't flag) and ORACLE SQL (verbatim) between the working
tree and a baseline git ref — normally the previous round's artifact
commit — and prints the changed/added/removed sets.

Usage:
    python scripts/changed_queries.py <baseline-ref> [--json]

How it works: a throwaway `git worktree` is checked out at the baseline
ref and a subprocess (cwd = that worktree, so imports resolve to the OLD
tree) dumps {name: {fn: sha256, oracle: sha256}} for its registry; the
same dump runs in-process for the current tree; the two dicts diff.

The fingerprint covers, per registered query: the function body
(AST-normalized), the oracle string (verbatim), module-level STRING
constants the function references (SQL kept in module constants — the
q_sql_transform pattern, whose engine change the fn axis missed in r11
before this was added), and — one import-graph level deep — the source
hash of every `operators/` / `functions/` helper module the function
references (VERDICT r11 item 3: an operator-module behavior change
under an unchanged query fn used to escape the cut). Name collection
recurses into nested code objects (lambdas / comprehensions / inner
defs), so a constant or helper referenced only inside a closure still
joins the fingerprint (ADVICE r11).

Known limitation (documented, deliberate): helper hashing is ONE level
deep and scoped to `operators/` + `functions/` — a change buried two
imports away (helper-of-helper), or in a shared non-operator module
(catalog/session/sources), will not flag. Those are exactly the changes
the full-registry sf0.01 parity sweep exists to catch; this script's
job is the narrower driver-evidence-freshness policy ("a query whose
EXPRESSION changed outranks aging refresh in the window"). Helper-module
hashes are RAW SOURCE (comment edits flag) — deliberately conservative:
a false rotation costs one window slot, a missed one costs evidence.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

_DUMP_SNIPPET = r"""
import ast, hashlib, inspect, json, sys, textwrap, types

from etl_open_source_spark.registry import get_registry

_PKG = "etl_open_source_spark"
_HELPER_PREFIXES = (_PKG + ".operators.", _PKG + ".functions.")


def _code_names(code):
    # co_names of the top-level code object PLUS every nested code object
    # (lambda / comprehension / inner def) — a module constant or helper
    # referenced only inside a closure gets its own code object and would
    # otherwise escape the fingerprint (ADVICE r11).
    names = set(code.co_names)
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            names |= _code_names(c)
    return names


_MOD_SRC_CACHE = {}


def _module_src_hash(modname):
    if modname not in _MOD_SRC_CACHE:
        try:
            import importlib

            mod = sys.modules.get(modname) or importlib.import_module(modname)
            src = inspect.getsource(mod)
        except Exception:  # pragma: no cover - not importable / no source
            src = ""
        _MOD_SRC_CACHE[modname] = hashlib.sha256(src.encode()).hexdigest()
    return _MOD_SRC_CACHE[modname]


def _ast_helper_imports(tree):
    # Function-LOCAL imports (`from ...operators import similarity as S2`
    # inside the body) bind locals, so co_names resolution against the
    # module globals misses them — walk the AST import statements too.
    mods = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if _is_helper_module(a.name):
                    mods.add(a.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            if _is_helper_module(node.module):
                mods.add(node.module)
            else:
                for a in node.names:
                    cand = node.module + "." + a.name
                    if _is_helper_module(cand):
                        mods.add(cand)
    return mods


def _is_helper_module(modname):
    return isinstance(modname, str) and modname.startswith(_HELPER_PREFIXES)


def _fn_fingerprint(fn):
    src = textwrap.dedent(inspect.getsource(fn))
    try:
        tree = ast.parse(src)
        fdef = tree.body[0]
        # strip the docstring so doc-only edits don't flag a rotation
        if (
            fdef.body
            and isinstance(fdef.body[0], ast.Expr)
            and isinstance(fdef.body[0].value, ast.Constant)
            and isinstance(fdef.body[0].value.value, str)
        ):
            fdef.body = fdef.body[1:] or [ast.Pass()]
        # drop decorators: the oracle lives in the @query(...) call and is
        # fingerprinted separately (verbatim); keeping it here would
        # double-flag and also flag tag/bench metadata edits
        fdef.decorator_list = []
        norm = ast.unparse(tree)
        ast_helpers = _ast_helper_imports(tree)
    except SyntaxError:  # pragma: no cover - unparseable source
        norm = src
        ast_helpers = set()
    # Module-level STRING constants the fn references join the fingerprint:
    # a query like q_sql_transform keeps its Spark SQL in a module
    # constant, so an engine change there never touches the fn body
    # (observed r11 — only the oracle axis caught it). Name collection
    # recurses into nested code objects (ADVICE r11).
    mod = sys.modules.get(fn.__module__)
    helper_mods = set(ast_helpers)
    for nm in sorted(_code_names(fn.__code__)):
        v = getattr(mod, nm, None)
        if isinstance(v, str):
            norm += f"\n#const {nm}={v}"
        elif isinstance(v, types.ModuleType) and _is_helper_module(v.__name__):
            helper_mods.add(v.__name__)
        elif callable(v) and _is_helper_module(getattr(v, "__module__", None)):
            helper_mods.add(v.__module__)
    # One import-graph level deep: the raw source hash of every operators/
    # and functions/ module the fn references — an operator behavior
    # change under an unchanged query fn must still flag (VERDICT r11).
    for hm in sorted(helper_mods):
        norm += f"\n#helper {hm}={_module_src_hash(hm)}"
    return hashlib.sha256(norm.encode()).hexdigest()


out = {}
for name, qd in get_registry().items():
    oracle = qd.oracle or ""
    out[name] = {
        "fn": _fn_fingerprint(qd.fn),
        "oracle": hashlib.sha256(oracle.encode()).hexdigest(),
    }
json.dump(out, sys.stdout, sort_keys=True)
"""


def _dump_at(cwd: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _DUMP_SNIPPET],
        cwd=cwd,
        capture_output=True,
        text=True,
        check=False,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise SystemExit(f"registry dump failed in {cwd}")
    return json.loads(proc.stdout)


def changed_queries(baseline_ref: str, repo_root: str = ".") -> dict:
    repo_root = str(Path(repo_root).resolve())
    current = _dump_at(repo_root)
    with tempfile.TemporaryDirectory(prefix="cq_worktree_") as tmp:
        wt = str(Path(tmp) / "baseline")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, baseline_ref],
            cwd=repo_root,
            check=True,
            capture_output=True,
        )
        try:
            baseline = _dump_at(wt)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=repo_root,
                check=False,
                capture_output=True,
            )
    changed = {}
    for name in sorted(set(current) & set(baseline)):
        axes = [
            ax for ax in ("fn", "oracle") if current[name][ax] != baseline[name][ax]
        ]
        if axes:
            changed[name] = "+".join(axes)
    return {
        "baseline": baseline_ref,
        "changed": changed,
        "added": sorted(set(current) - set(baseline)),
        "removed": sorted(set(baseline) - set(current)),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("baseline_ref", help="git ref of the previous round's artifact commit")
    ap.add_argument("--json", action="store_true", help="emit machine-readable JSON")
    args = ap.parse_args()
    result = changed_queries(args.baseline_ref)
    if args.json:
        json.dump(result, sys.stdout, indent=2, sort_keys=True)
        print()
        return
    print(f"baseline: {result['baseline']}")
    print(f"changed ({len(result['changed'])}):")
    for name, axes in result["changed"].items():
        print(f"  {name}  [{axes}]")
    print(f"added ({len(result['added'])}): {', '.join(result['added']) or '-'}")
    print(f"removed ({len(result['removed'])}): {', '.join(result['removed']) or '-'}")


if __name__ == "__main__":
    main()
