"""CLI + validation-service tests (subprocess-free: main() called
directly; the subprocess path is exercised by the verify recipe)."""

from __future__ import annotations

import json

import pytest

from etl_open_source_spark.__main__ import main
from etl_open_source_spark.plans.models import PipelineSpec
from etl_open_source_spark.plans.validation import validate_spec

SPEC = "examples/orders_rollup.json"


def test_validate_ok(capsys):
    assert main(["validate", SPEC]) == 0
    assert "is valid" in capsys.readouterr().out


def test_validate_catches_issues(tmp_path, capsys):
    spec = json.load(open(SPEC))
    spec["steps"][0]["connection_id"] = "nope"
    spec["steps"][1]["config"].pop("sql")
    spec["cron"] = "0 9 1 * *"
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(spec))
    assert main(["validate", str(bad)]) == 1
    out = capsys.readouterr().out
    assert "unknown connection" in out
    assert "missing 'sql'" in out
    assert "invalid cron" in out


def test_validate_step_order_and_first_step(tmp_path):
    spec = PipelineSpec.load(SPEC)
    spec.steps[0].order = spec.steps[1].order
    issues = validate_spec(spec)
    assert any("duplicate step orders" in i for i in issues)

    spec = PipelineSpec.load(SPEC)
    spec.steps = [s for s in spec.steps if s.step_type.value != "extract"]
    issues = validate_spec(spec)
    assert any("expected extract" in i for i in issues)


def test_validate_jdbc_connection_and_extract(tmp_path):
    """A jdbc spec with no url, or a jdbc extract with neither 'query' nor
    'table', must fail validation — previously both passed validate and
    crashed the runner mid-pipeline with a raw KeyError."""
    spec = PipelineSpec.load("examples/jdbc_rollup.json")
    spec.connections[0].params.pop("url")
    issues = validate_spec(spec)
    assert any("missing 'url'" in i for i in issues)

    spec = PipelineSpec.load("examples/jdbc_rollup.json")
    spec.steps[0].config.pop("query")
    issues = validate_spec(spec)
    assert any("needs 'query' or 'table'" in i for i in issues)

    # the shipped example itself stays valid
    assert validate_spec(PipelineSpec.load("examples/jdbc_rollup.json")) == []

    # type matching must be case-insensitive like the runner's
    # conn.type.lower() dispatch — a "JDBC" spec must not bypass the checks
    spec = PipelineSpec.load("examples/jdbc_rollup.json")
    spec.connections[0].type = "JDBC"
    spec.connections[0].params.pop("url")
    spec.steps[0].config.pop("query")
    issues = validate_spec(spec)
    assert any("missing 'url'" in i for i in issues)
    assert any("needs 'query' or 'table'" in i for i in issues)


def test_next_run_prints_timestamp(capsys):
    assert main(["next-run", SPEC]) == 0
    out = capsys.readouterr().out.strip()
    assert len(out) == 19 and out[4] == "-" and out[13] == ":"


def test_bench_json_contract():
    """bench.py must print exactly ONE JSON line with the driver-contract
    keys; run at sf0.001 with 1 rep, no quiet-box wait (the gate burned
    its full 300 s budget when the suite itself loaded the box — 337 s of
    the old 60-min suite), and a 3-query representative subset (plain
    agg, Python-kernel path, persist+clearCache path)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_BENCH_QUIET_WAIT="0",
        SPARK_GRAFT_BENCH_ONLY="q_agg_groupby,q_sim_topk,q_dedup_near",
        PYTHONPATH=os.path.dirname(os.path.dirname(__file__)),
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout + proc.stderr[-1000:]
    d = json.loads(lines[0])
    assert d["metric"] == "headline_queries_total" and d["unit"] == "sec"
    assert d["value"] > 0 and d["sf"] == 0.001
    assert set(d["queries"]) == {"q_agg_groupby", "q_sim_topk", "q_dedup_near"}
    assert set(d["queries"]) == set(d["spread"])
    for s in d["spread"].values():
        assert s["min"] <= s["median"] <= s["max"]
    assert d["n_samples"] == 1


def test_snapshot_diff_example_runs_and_matches_operator(spark, sf_dir):
    """The shipped examples/snapshot_diff.json is actually runnable AND its
    SQL-transform changelog equals the engine operator's output
    (q_snapshot_diff) row-for-row — spec layer and operator layer agree.
    (Run through PipelineRunner on the shared session — `main(["run"])`
    owns and stops its own SparkSession; the subprocess CLI path is the
    verify recipe's job.)"""
    import tempfile

    from etl_open_source_spark.plans.runner import PipelineRunner
    from etl_open_source_spark.registry import get_registry

    assert main(["validate", "examples/snapshot_diff.json"]) == 0
    runner = PipelineRunner(
        spark, history_path=tempfile.mkdtemp(prefix="etl_snapdiff_") + "/history"
    )
    runner.run(PipelineSpec.load("examples/snapshot_diff.json"))

    got = spark.read.parquet("/tmp/etl_cli_demo/orders_changelog")
    want = get_registry()["q_snapshot_diff"].fn(spark, "/root/testdata/sf0.001")
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    assert got.count() == want.count()
    assert (
        got.select(cols).exceptAll(want.select(cols)).count() == 0
        and want.select(cols).exceptAll(got.select(cols)).count() == 0
    )


def test_incremental_example_validates():
    assert main(["validate", "examples/incremental_events.json"]) == 0


_EXAMPLES = sorted(
    __import__("glob").glob(
        __import__("os").path.join(
            __import__("os").path.dirname(__import__("os").path.dirname(__file__)),
            "examples",
            "*.json",
        )
    )
)


@pytest.mark.parametrize("spec_path", _EXAMPLES)
def test_every_shipped_example_validates(spec_path):
    """Every example spec in the repo must pass validation — a shipped
    spec that fails validate is documentation that lies. (Glob anchored
    to this file, not the cwd — a cwd-relative glob collects ZERO cases
    when pytest runs from elsewhere and the guard silently vanishes.)"""
    assert main(["validate", spec_path]) == 0, spec_path


def test_example_glob_found_specs():
    assert len(_EXAMPLES) >= 6  # the guard itself must never go empty


def test_validate_malformed_spec_returns_invalid(tmp_path, capsys):
    """A spec that cannot even be parsed (missing 'id') must yield
    INVALID + exit 1 — validate's whole job is static checking, so a raw
    KeyError traceback is a bug, not an answer."""
    bad = tmp_path / "malformed.json"
    bad.write_text('{"name": "x"}')
    assert main(["validate", str(bad)]) == 1
    assert "INVALID: cannot load spec" in capsys.readouterr().out


def test_list_queries_surface(capsys):
    """list-queries prints the registered operator surface (no spec, no
    SparkSession) and filters by tag — the discoverability a user
    switching from the reference needs to find their operator."""
    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "q_agg_groupby" in out and "exact-oracle" in out and "rows-only" in out

    assert main(["list-queries", "--tag", "maintenance"]) == 0
    out = capsys.readouterr().out
    assert "q_snapshot_diff" in out and "q_agg_groupby" not in out


def test_changed_queries_fingerprint_ignores_docs_flags_expressions(tmp_path):
    """The mechanized window-cut detector (scripts/changed_queries.py,
    VERDICT r10 item 2): its fingerprint must IGNORE docstring/comment
    edits (doc-only changes don't demand a driver-window slot) while
    flagging any expression or oracle change. Exercised on the dump
    snippet it actually runs, not a reimplementation."""
    import hashlib
    import importlib.util
    import textwrap
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "changed_queries",
        Path(__file__).resolve().parents[1] / "scripts" / "changed_queries.py",
    )
    cq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cq)
    ns: dict = {}
    exec(  # noqa: S102 - executing our own snippet minus its __main__ dump
        cq._DUMP_SNIPPET.split("out = {}")[0], ns
    )
    fp = ns["_fn_fingerprint"]

    def make(idx: int, body_doc: str, expr: str):
        # inspect.getsource needs a real file, so each variant becomes a
        # throwaway module on disk
        src = textwrap.dedent(
            f'''
            def q(spark, sf_dir):
                """{body_doc}"""
                # a comment that AST drops
                return {expr}
            '''
        )
        mod_path = tmp_path / f"fpmod{idx}.py"
        mod_path.write_text(src)
        mspec = importlib.util.spec_from_file_location(f"fpmod{idx}", mod_path)
        mod = importlib.util.module_from_spec(mspec)
        mspec.loader.exec_module(mod)
        return mod.q

    base = make(0, "original doc", "1 + 1")
    doc_only = make(1, "totally rewritten documentation", "1 + 1")
    expr_change = make(2, "original doc", "2 + 2")
    assert fp(base) == fp(doc_only)
    assert fp(base) != fp(expr_change)
    # oracle strings are fingerprinted verbatim — any byte counts
    assert (
        hashlib.sha256(b"SELECT 1").hexdigest()
        != hashlib.sha256(b"SELECT  1").hexdigest()
    )


def _load_dump_snippet_ns() -> dict:
    """Exec the detector's _DUMP_SNIPPET preamble (everything before the
    registry dump loop) so tests exercise the code it actually runs."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "changed_queries",
        Path(__file__).resolve().parents[1] / "scripts" / "changed_queries.py",
    )
    cq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cq)
    ns: dict = {}
    exec(cq._DUMP_SNIPPET.split("out = {}")[0], ns)  # noqa: S102
    return ns


def _make_fn(tmp_path, idx: int, src: str):
    import importlib.util
    import sys
    import textwrap

    mod_path = tmp_path / f"helpermod{idx}.py"
    mod_path.write_text(textwrap.dedent(src))
    mspec = importlib.util.spec_from_file_location(f"helpermod{idx}", mod_path)
    mod = importlib.util.module_from_spec(mspec)
    # registered: the fingerprint resolves fn globals via
    # sys.modules[fn.__module__], exactly as it does for real query modules
    sys.modules[mspec.name] = mod
    mspec.loader.exec_module(mod)
    return mod.q


def test_changed_queries_flags_helper_module_edit(tmp_path):
    """VERDICT r11 item 3: a no-op (comment-only) edit to an operators/
    helper module must flag every query that references it — via a
    module-global reference AND via a function-LOCAL import — because an
    operator behavior change under an unchanged query fn used to escape
    the window cut. Exercised on the dump snippet itself."""
    import importlib.util
    import sys

    ns = _load_dump_snippet_ns()
    fp, cache = ns["_fn_fingerprint"], ns["_MOD_SRC_CACHE"]

    helper_name = "etl_open_source_spark.operators._fp_test_helper"
    helper_path = tmp_path / "_fp_test_helper.py"
    helper_path.write_text("def helper_fn(x):\n    return x + 1\n")
    hspec = importlib.util.spec_from_file_location(helper_name, helper_path)
    helper = importlib.util.module_from_spec(hspec)
    hspec.loader.exec_module(helper)
    sys.modules[helper_name] = helper
    try:
        q_global = _make_fn(
            tmp_path,
            10,
            f'''
            import sys
            H = sys.modules["{helper_name}"]
            def q(spark, sf_dir):
                return H.helper_fn(1)
            ''',
        )
        q_local = _make_fn(
            tmp_path,
            11,
            """
            def q(spark, sf_dir):
                from etl_open_source_spark.operators import (
                    _fp_test_helper as H,
                )
                return H.helper_fn(1)
            """,
        )
        before_global, before_local = fp(q_global), fp(q_local)

        # comment-only edit: raw-source helper hashing is deliberately
        # conservative — even this must rotate the dependents
        helper_path.write_text(
            "# tightened epsilon rationale\ndef helper_fn(x):\n    return x + 1\n"
        )
        hspec.loader.exec_module(helper)
        import linecache

        linecache.clearcache()  # inspect.getsource caches per-path
        cache.clear()
        assert fp(q_global) != before_global, "global helper ref did not flag"
        assert fp(q_local) != before_local, "function-local import did not flag"
    finally:
        sys.modules.pop(helper_name, None)


def test_changed_queries_sees_constants_in_nested_code_objects(tmp_path):
    """ADVICE r11: a module-level SQL constant referenced ONLY inside a
    nested code object (lambda/comprehension/inner def) has its name in
    the nested co_names, not the top-level fn's — the fingerprint must
    recurse or the q_sql_transform-style miss recurs one level down."""
    ns = _load_dump_snippet_ns()
    fp = ns["_fn_fingerprint"]
    template = '''
        CONST_SQL = "{sql}"
        def q(spark, sf_dir):
            inner = lambda: CONST_SQL
            return [inner() for _ in range(1)]
        '''
    before = fp(_make_fn(tmp_path, 20, template.format(sql="SELECT 1")))
    after = fp(_make_fn(tmp_path, 21, template.format(sql="SELECT 2")))
    assert before != after, "nested-closure constant edit did not flag"
