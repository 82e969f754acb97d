"""Session-factory invariants.

These pin configuration the whole engine depends on; each has bitten once:
- ANSI off + UTC: the token checksum relies on Java long wraparound and the
  DuckDB oracle comparison assumes UTC timestamps (CLAUDE.md invariants).
- Driver memory capped at 16g: an oversized local-mode heap is a measured
  5-15x slowdown, not headroom — at 48g, G1's young gen balloons and
  allocation-heavy parquet token scans hit 0.8-7.3s evacuation pauses
  (same scan loop at 8g: 0.9-1.4s steady). Local mode puts executor tasks
  in the driver JVM, so this single value sizes the engine; see
  BENCH/BASELINE.md "Round-3 RESOLUTION".
"""

from forecaster_spark import session as sess_mod


def test_session_invariants(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_driver_memory_default_stays_capped():
    """Guard against 'adding headroom' back: the source default must stay
    <= 16g unless SPARK_GRAFT_DRIVER_MEM deliberately overrides it."""
    import ast
    import pathlib

    src = pathlib.Path(sess_mod.__file__).read_text()
    tree = ast.parse(src)
    defaults = [
        node.args[1].value
        for node in ast.walk(tree)
        if isinstance(node, ast.Call)
        and getattr(node.func, "attr", "") == "get"
        and node.args
        and isinstance(node.args[0], ast.Constant)
        and node.args[0].value == "SPARK_GRAFT_DRIVER_MEM"
    ]
    assert defaults, "driver-memory default not found in session.py"
    gb = int(defaults[0].rstrip("g"))
    assert gb <= 16, f"local-mode heap default grew to {gb}g — see BENCH/BASELINE.md GC pathology"
