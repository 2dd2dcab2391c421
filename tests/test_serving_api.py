"""APIServingBackend vs a local HTTP stub: thread-pool fan-out with
order-restored results, None-on-error rows, format_response wrapping
(api_llm_serving_request.py:27-31,34-48,101-126). No Ray needed."""
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from dataflow_mm_ray.serving import APIServingBackend


class _StubHandler(BaseHTTPRequestHandler):
    """Echoes the prompt; injects failures/latency on marked prompts."""

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        prompt = body["messages"][1]["content"]
        if "FAIL500" in prompt:
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"boom")
            return
        if "SLOW" in prompt:
            time.sleep(0.3)  # forces out-of-order completion
        msg = {"content": f"echo:{prompt}"}
        if "REASON" in prompt:
            msg["reasoning_content"] = "because"
        if "PRESHAPED" in prompt:
            msg["content"] = "<think>t</think> x <answer>a</answer>"
            msg["reasoning_content"] = "ignored"
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(json.dumps({"choices": [{"message": msg}]}).encode())

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def stub_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1/chat/completions"
    srv.shutdown()


def test_missing_api_key_raises(monkeypatch):
    monkeypatch.delenv("DF_TEST_KEY", raising=False)
    with pytest.raises(ValueError, match="DF_TEST_KEY"):
        APIServingBackend("http://x", key_name_of_api_key="DF_TEST_KEY")


def test_fanout_order_restored_and_none_on_error(stub_server, monkeypatch):
    monkeypatch.setenv("DF_TEST_KEY", "k")
    backend = APIServingBackend(
        stub_server, key_name_of_api_key="DF_TEST_KEY", max_workers=8,
        timeout_s=10.0,
    )
    # SLOW first so it finishes LAST; order must still be restored,
    # failures must be None without affecting neighbors
    prompts = ["SLOW p0", "p1", "FAIL500 p2", "p3", "SLOW p4", "FAIL500 p5", "p6"]
    out = backend.generate(prompts)
    assert out == [
        "echo:SLOW p0", "echo:p1", None, "echo:p3",
        "echo:SLOW p4", None, "echo:p6",
    ]


def test_connection_error_is_none_per_row(monkeypatch):
    monkeypatch.setenv("DF_TEST_KEY", "k")
    backend = APIServingBackend(
        "http://127.0.0.1:1/nothing", key_name_of_api_key="DF_TEST_KEY",
        timeout_s=0.5,
    )
    assert backend.generate(["a", "b"]) == [None, None]


def test_format_response_wrapping(stub_server, monkeypatch):
    monkeypatch.setenv("DF_TEST_KEY", "k")
    backend = APIServingBackend(
        stub_server, key_name_of_api_key="DF_TEST_KEY", timeout_s=10.0
    )
    out = backend.generate(["plain", "REASON q", "PRESHAPED q"])
    assert out[0] == "echo:plain"
    # reasoning_content wraps (api_llm_serving_request.py:44-48)
    assert out[1] == "<think>because</think>\n<answer>echo:REASON q</answer>"
    # already-shaped content passes through untouched (lines 36-38)
    assert out[2] == "<think>t</think> x <answer>a</answer>"
