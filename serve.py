"""Serve a LLaMA checkpoint over HTTP with continuous batching.

Beyond the reference (it has no service layer, SURVEY.md §1): a stdlib-only JSON
API in front of the continuous-batching DecodeEngine. One background thread owns
the device; HTTP threads enqueue requests and wait on per-request events.

  POST /generate  {"prompt": str, "max_new_tokens": int, "temperature": float,
                   "top_k": int}  ->  {"text": str, "tokens": [...], "ttft_ms": ...}
  GET  /health    -> {"active": n, "queued": n}
"""

import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.resolve()
sys.path.insert(0, str(wd))


class _Server:
    def __init__(self, engine, tokenizer):
        self.engine = engine
        self.tokenizer = tokenizer
        self.lock = threading.Lock()
        self.events = {}
        self.results = {}
        self.running = True

    def submit(self, prompt_text, max_new_tokens, temperature, top_k):
        encoded = self.tokenizer.encode(prompt_text, bos=True, eos=False)
        ev = threading.Event()
        with self.lock:
            rid = self.engine.submit(
                encoded,
                max_new_tokens,
                temperature=temperature,
                top_k=top_k,
                eos_id=self.tokenizer.eos_id,
            )
            self.events[rid] = ev
        ev.wait()
        return self.results.pop(rid)

    def loop(self):
        while self.running:
            with self.lock:
                has = self.engine.has_work()
                done = self.engine.step_once() if has else []
                for req in done:
                    self.results[req.id] = req
                    self.events.pop(req.id).set()
            if not has:
                time.sleep(0.005)


def main(
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    quantize: Optional[str] = None,
    model_size: Optional[str] = None,
    host: str = "127.0.0.1",
    port: int = 8000,
    max_batch: int = 8,
    max_seq_length: Optional[int] = None,
    steps_per_sync: int = 4,
    model_parallel: int = 1,
    kv_cache_dtype: Optional[str] = None,
) -> None:
    """Serve a model over HTTP with continuous batching.

    Args:
        checkpoint_path: The checkpoint path to load (.pth or native dir).
        tokenizer_path: The tokenizer path to load.
        quantize: Whether to quantize the model: "llm.int8" or "gptq.int4".
        model_size: Override the model preset if it cannot be inferred.
        host: Bind address.
        port: Bind port.
        max_batch: Concurrent decode slots.
        max_seq_length: KV-cache length (default: model block_size).
        steps_per_sync: Decode steps per host sync (latency/throughput knob).
        model_parallel: Tensor-parallel degree (shard_map over the model mesh axis).
        kv_cache_dtype: KV-cache storage: None (compute dtype) or "int8" (half memory).
    """
    from lit_llama_tpu.data.tokenizer import Tokenizer
    from lit_llama_tpu.serve.engine import DecodeEngine
    from lit_llama_tpu.utils.loader import load_model

    print("Loading model ...", file=sys.stderr)
    params, config = load_model(Path(checkpoint_path), quantize, model_size)
    if kv_cache_dtype:
        config = config.replace(kv_cache_dtype=kv_cache_dtype)
    tokenizer = Tokenizer(tokenizer_path)
    mesh = None
    if model_parallel > 1:
        from lit_llama_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(data=1, model=model_parallel)
    engine = DecodeEngine(
        params, config, max_batch=max_batch, max_seq_length=max_seq_length,
        steps_per_sync=steps_per_sync, mesh=mesh,
    )
    print("warming up (compiling prefill buckets + decode step)...", file=sys.stderr)
    engine.warmup()
    from lit_llama_tpu.utils.memory import print_peak_memory

    print_peak_memory()  # weights + slotted KV cache (reference: generate.py:154-155)
    server = _Server(engine, tokenizer)
    t = threading.Thread(target=server.loop, daemon=True)
    t.start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(
                    200,
                    {"active": engine.n_active, "queued": len(engine.queue)},
                )
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                top_k = body.get("top_k")
                req = server.submit(
                    body.get("prompt", ""),
                    int(body.get("max_new_tokens", 50)),
                    float(body.get("temperature", 0.8)),
                    None if top_k is None else int(top_k),
                )
                text = tokenizer.decode(req.generated)
                self._json(
                    200,
                    {
                        "text": text,
                        "tokens": req.generated,
                        "ttft_ms": None if req.ttft is None else round(req.ttft * 1e3, 1),
                        "total_ms": round((req.done_t - req.submit_t) * 1e3, 1),
                    },
                )
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": str(e)})

    httpd = ThreadingHTTPServer((host, port), Handler)
    print(f"serving on http://{host}:{port}", file=sys.stderr)
    try:
        httpd.serve_forever()
    finally:
        server.running = False


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
