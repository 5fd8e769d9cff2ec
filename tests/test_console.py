"""Console tests: script mode and statement splitting
(reference: console --script, src/bin/console/main.rs:41-63)."""

import io
import subprocess
import sys

from datafusion_tpu.console.main import Console


def test_script_mode(tmp_path, data_dir):
    script = tmp_path / "q.sql"
    script.write_text(
        "CREATE EXTERNAL TABLE t1 (a INT NOT NULL, b DOUBLE NOT NULL) "
        f"STORED AS CSV WITH HEADER ROW LOCATION '{data_dir}/aggregate_test_1.csv';\n"
        "SELECT a, MIN(b), MAX(b) FROM t1 GROUP BY a ORDER BY a;\n"
    )
    out = io.StringIO()
    console = Console(out=out)
    console.run_script(str(script))
    text = out.getvalue()
    assert "1\t1.1\t2.2" in text
    assert "2\t3.3\t5.5" in text
    assert "3\t1.0\t2.0" in text
    assert "row(s) in" in text


def test_error_reporting():
    out = io.StringIO()
    Console(out=out).execute("SELECT nope FROM missing")
    assert out.getvalue().startswith("Error:")


def test_cli_subprocess(tmp_path, data_dir):
    script = tmp_path / "q.sql"
    script.write_text(
        "CREATE EXTERNAL TABLE c (city VARCHAR(100) NOT NULL, lat DOUBLE NOT NULL, "
        f"lng DOUBLE NOT NULL) STORED AS CSV WITHOUT HEADER ROW LOCATION '{data_dir}/uk_cities.csv';\n"
        "SELECT city, lat FROM c WHERE lat > 57;\n"
    )
    proc = subprocess.run(
        [sys.executable, "-m", "datafusion_tpu.console", "--script", str(script)],
        capture_output=True,
        text=True,
        timeout=240,
        env={
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
            "DFTPU_FORCE_CPU": "1",
        },
    )
    assert proc.returncode == 0, proc.stderr
    assert '"Elgin, Scotland, the UK"' in proc.stdout
