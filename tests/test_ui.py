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
    finally:
        server.shutdown()


def test_cli_serve_port_records_pipeline_stages(spark, tmp_path, capsys):
    from etl_guiacores_spark.cli import main

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


def test_progress_cb_multiplexes_to_board():
    from types import SimpleNamespace

    from etl_guiacores_spark.cli import _progress_cb

    board = ProgressBoard()
    args = SimpleNamespace(progress=False, _progress_board=board)
    emit = _progress_cb(args)
    emit("gold", {"records": 3})
    assert board.events()[0]["stage"] == "gold"
    assert board.events()[0]["records"] == 3
