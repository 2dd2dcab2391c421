"""VLMServingBackend vs a local HTTP stub + pure message-construction
rules (api_vlm_serving_openai.py). No Ray needed."""
import base64
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from dataflow_mm_ray.serving_vlm import (
    VLMServingBackend,
    build_message_content,
    build_messages_from_conversation,
    combine_images_to_base64,
    extract_markdown_images,
    guess_audio_format,
    image_mime,
    image_mime_strict,
    is_base64,
)


@pytest.fixture()
def media(tmp_path):
    files = {}
    for name, payload in [
        ("a.png", b"\x89PNG-fake-a"), ("b.jpg", b"jpg-fake-b"),
        ("c.webp", b"webp-fake-c"), ("d.tiff", b"tiff-fake-d"),
        ("v.mov", b"mov-fake-v"), ("s.flac", b"flac-fake-s"),
        ("s.mpga", b"mpga-fake-s"), ("s.xyz", b"xyz-fake-s"),
    ]:
        p = tmp_path / name
        p.write_bytes(payload)
        files[name] = str(p)
    return files


def test_mime_rules():
    # content-builder rule: unknown -> jpeg (lines 574-585)
    assert image_mime("x.JPG") == "jpeg"
    assert image_mime("x.png") == "png"
    assert image_mime("x.webp") == "webp"
    assert image_mime("x.tiff") == "jpeg"
    # strict single-image rule raises (lines 61-83)
    assert image_mime_strict("x.jpeg") == "jpeg"
    with pytest.raises(ValueError, match="webp"):
        image_mime_strict("x.webp")


def test_audio_format_guess():
    assert guess_audio_format("a.WAV") == "wav"
    assert guess_audio_format("a.mpga") == "mp3"
    assert guess_audio_format("a.mp4") == "mp4"
    assert guess_audio_format("a.weird") == "wav"


def test_content_order_and_data_urls(media):
    content = build_message_content(
        "the prompt",
        image_paths=[media["a.png"], None, media["d.tiff"]],
        video_paths=[media["v.mov"]],
        audio_paths=[media["s.mpga"]],
    )
    kinds = [c["type"] for c in content]
    # images -> videos -> audios -> text, falsy paths skipped
    assert kinds == ["image_url", "image_url", "video_url", "audio_url", "text"]
    assert content[0]["image_url"]["url"] == (
        "data:image/png;base64," + base64.b64encode(b"\x89PNG-fake-a").decode()
    )
    assert content[1]["image_url"]["url"].startswith("data:image/jpeg;base64,")
    # video is always video/mp4 regardless of ext (lines 597-601)
    assert content[2]["video_url"]["url"].startswith("data:video/mp4;base64,")
    assert content[3]["audio_url"]["url"].startswith("data:audio/mp3;base64,")
    assert content[4] == {"type": "text", "text": "the prompt"}


def test_conversation_attaches_media_to_last_user_turn_only(media):
    conv = [
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": "a1"},
        {"role": "user", "content": "q2"},
    ]
    msgs = build_messages_from_conversation(
        conv, image_paths=[media["b.jpg"]], audio_paths=[media["s.flac"]],
        system_prompt="sys")
    assert msgs[0] == {"role": "system", "content": "sys"}
    assert msgs[1] == {"role": "user", "content": "q1"}       # plain text
    assert msgs[2] == {"role": "assistant", "content": "a1"}
    last = msgs[3]
    assert last["role"] == "user"
    kinds = [c["type"] for c in last["content"]]
    # audio attaches to the CONTENT list (intended semantics; the
    # reference's line-816 str-append bug is documented, not copied)
    assert kinds == ["image_url", "audio_url", "text"]
    assert last["content"][-1]["text"] == "q2"
    # a conversation ending in an assistant turn gets no media at all
    msgs2 = build_messages_from_conversation(
        conv[:2], image_paths=[media["b.jpg"]])
    assert all(isinstance(m["content"], str) for m in msgs2)
    # reference is-last test is VALUE equality (api_vlm_serving_openai.py
    # line 771: turn == conversation[-1]) — an earlier user turn that is
    # dict-equal to the final one gets media attached TOO
    dup = [
        {"role": "user", "content": "continue"},
        {"role": "assistant", "content": "ok"},
        {"role": "user", "content": "continue"},
    ]
    msgs3 = build_messages_from_conversation(
        dup, image_paths=[media["b.jpg"]], system_prompt="")
    assert isinstance(msgs3[0]["content"], list)   # dup of last: media
    assert isinstance(msgs3[1]["content"], str)    # assistant: plain
    assert isinstance(msgs3[2]["content"], list)   # the last turn itself


def test_is_base64_and_markdown_extraction():
    assert is_base64(base64.b64encode(b"hello").decode())
    assert not is_base64("not-base64!!!")
    assert not is_base64(12345)
    good = base64.b64encode(b"imgbytes").decode()
    content = (
        f"text ![alt](data:image/png;base64,{good}) more "
        f"![x](data:image/jpeg;base64,###bad###) tail"
    )
    # bad match is skipped (never matches the regex char class), good decodes
    assert extract_markdown_images(content) == [b"imgbytes"]
    assert extract_markdown_images("") == []


class _StubHandler(BaseHTTPRequestHandler):
    """Echoes a digest of the received messages; injects failures."""

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        user = body["messages"][-1]["content"]
        if isinstance(user, list):
            text = next(c["text"] for c in user if c["type"] == "text")
            n_media = len(user) - 1
        else:
            text, n_media = user, 0
        if "FAIL500" in text:
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"boom")
            return
        if "SLOW" in text:
            time.sleep(0.3)
        reply = {"choices": [{"message": {
            "content": f"echo:{text}|media={n_media}|turns={len(body['messages'])}"
        }}]}
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(json.dumps(reply).encode())

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def stub_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1/chat/completions"
    srv.shutdown()


def test_missing_key_raises_environmenterror(monkeypatch):
    monkeypatch.delenv("DF_VLM_KEY", raising=False)
    # EnvironmentError, not ValueError — the two reference clients differ
    with pytest.raises(EnvironmentError, match="DF_VLM_KEY"):
        VLMServingBackend("http://x", key_name_of_api_key="DF_VLM_KEY")


def test_fanout_order_and_error_string_rows(stub_server, monkeypatch, media):
    monkeypatch.setenv("DF_VLM_KEY", "k")
    backend = VLMServingBackend(
        stub_server, key_name_of_api_key="DF_VLM_KEY", max_workers=8,
        timeout_s=10.0)
    prompts = ["SLOW p0", "p1", "FAIL500 p2", "p3"]
    out = backend.generate_from_input(
        prompts,
        # scalar (not list) media input exercises the normalization path
        image_inputs=[media["a.png"], [media["a.png"], media["b.jpg"]], None, None],
    )
    assert out[0] == "echo:SLOW p0|media=1|turns=2"
    assert out[1] == "echo:p1|media=2|turns=2"
    # error rows are "Error: ..." STRINGS, not None (lines 666-668)
    assert out[2].startswith("Error: ")
    assert out[3] == "echo:p3|media=0|turns=2"


def test_conversation_fanout(stub_server, monkeypatch, media):
    monkeypatch.setenv("DF_VLM_KEY", "k")
    backend = VLMServingBackend(
        stub_server, key_name_of_api_key="DF_VLM_KEY", timeout_s=10.0)
    convs = [
        [{"role": "user", "content": "solo"}],
        [{"role": "user", "content": "q"}, {"role": "assistant", "content": "a"},
         {"role": "user", "content": "SLOW follow-up"}],
    ]
    out = backend.generate_from_input_messages(
        convs, image_list=[None, media["c.webp"]])
    assert out[0] == "echo:solo|media=0|turns=2"       # sys + 1 turn
    assert out[1] == "echo:SLOW follow-up|media=1|turns=4"


def test_generate_interface(stub_server, monkeypatch):
    monkeypatch.setenv("DF_VLM_KEY", "k")
    backend = VLMServingBackend(
        stub_server, key_name_of_api_key="DF_VLM_KEY", timeout_s=10.0)
    assert backend.generate(["x"]) == ["echo:x|media=0|turns=2"]


def test_combine_images_layout():
    PIL = pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i, (w, h, color) in enumerate([(40, 20, (255, 0, 0)),
                                           (20, 30, (0, 255, 0))]):
            p = os.path.join(d, f"im{i}.png")
            Image.new("RGB", (w, h), color).save(p)
            paths.append(p)
        # horizontal: (40+20) x max(20,30) -> halved to 30x15
        out = Image.open(BytesIO(base64.b64decode(
            combine_images_to_base64(paths, "horizontal"))))
        assert out.size == (30, 15)
        # vertical: max(40,20) x (20+30) -> halved to 20x25
        out = Image.open(BytesIO(base64.b64decode(
            combine_images_to_base64(paths, "vertical"))))
        assert out.size == (20, 25)
        # grid: fixed 1024 canvas -> halved to 512
        out = Image.open(BytesIO(base64.b64decode(
            combine_images_to_base64(paths, "grid"))))
        assert out.size == (512, 512)
        with pytest.raises(ValueError):
            combine_images_to_base64(paths, "diagonal")
