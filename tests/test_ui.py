"""Progress-board UI: the stdlib twin of the reference's Streamlit
panel (reference: streamlit_app.py:66-81) — event capture, HTML and
JSON serving, and the CLI --serve-port integration."""

from __future__ import annotations

import json
import urllib.request

from etl_guiacores_spark.ui import ProgressBoard, start_server


def _get(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.read()


def test_board_serves_events_and_html():
    board = ProgressBoard()
    server = start_server(board, port=0)
    try:
        port = server.server_address[1]
        board.callback("bronze", {"records": 10})
        board.callback("silver", {"records": 9, "quarantined": 1})

        events = json.loads(_get(f"http://127.0.0.1:{port}/events.json"))
        assert [e["stage"] for e in events] == ["bronze", "silver"]
        assert events[1]["quarantined"] == 1
        assert all("elapsed_s" in e for e in events)

        page = _get(f"http://127.0.0.1:{port}/").decode()
        assert "bronze" in page and "silver" in page
        assert "running" in page and 'http-equiv="refresh"' in page

        board.callback("done", {"records": 9})
        page = _get(f"http://127.0.0.1:{port}/").decode()
        assert "finished" in page and "refresh" not in page

        # a stage payload carrying its own 'stage' key must not mask
        # the positional one (the renderer keys on the done sentinel)
        board.callback("post", {"stage": "evil", "records": 1})
        assert json.loads(_get(f"http://127.0.0.1:{port}/events.json"))[-1][
            "stage"
        ] == "post"

        # unknown paths are a real 404, not 200-with-HTML
        import urllib.error

        try:
            _get(f"http://127.0.0.1:{port}/favicon.ico")
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        server.server_close()


def test_cli_serve_port_records_pipeline_stages(spark, tmp_path, capsys, monkeypatch):
    import etl_guiacores_spark.ui as ui_mod
    from etl_guiacores_spark.cli import main

    captured: list[ProgressBoard] = []
    real_start = ui_mod.start_server

    def capture_start(board, **kw):
        captured.append(board)
        return real_start(board, **kw)

    monkeypatch.setattr(ui_mod, "start_server", capture_start)
    result = main(
        [
            "--out", str(tmp_path / "out"),
            "--serve-port", "0",
            "bulk", "--start-id", "1", "--end-id", "5",
        ],
        spark=spark,
    )
    assert result["status"] == "success"
    err = capsys.readouterr().err
    assert "progress board: http://127.0.0.1:" in err
    # the board actually received the pipeline's stage events
    stages = [e["stage"] for e in captured[0].events()]
    assert "done" in stages and len(stages) >= 2


def test_cli_serve_port_covers_corpus_mode(spark, tmp_path, monkeypatch):
    """--serve-port must not be silently dead in corpus mode."""
    import etl_guiacores_spark.ui as ui_mod
    from etl_guiacores_spark.cli import main

    captured: list[ProgressBoard] = []
    real_start = ui_mod.start_server

    def capture_start(board, **kw):
        captured.append(board)
        return real_start(board, **kw)

    monkeypatch.setattr(ui_mod, "start_server", capture_start)
    result = main(
        [
            "--out", str(tmp_path / "out"),
            "--serve-port", "0",
            "corpus", "--input", "/root/testdata/sf0.001/documents.parquet",
        ],
        spark=spark,
    )
    assert result["raw_docs"] > 0
    stages = [e["stage"] for e in captured[0].events()]
    assert stages[0] == "raw" and "near_dup" in stages and stages[-1] == "done"


def test_progress_cb_multiplexes_to_board():
    from types import SimpleNamespace

    from etl_guiacores_spark.cli import _progress_cb

    board = ProgressBoard()
    args = SimpleNamespace(progress=False, _progress_board=board)
    emit = _progress_cb(args)
    emit("gold", {"records": 3})
    assert board.events()[0]["stage"] == "gold"
    assert board.events()[0]["records"] == 3
