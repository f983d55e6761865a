"""Assemble a training corpus from the container's Python sources (zero-egress
stand-in for a real pretraining corpus) and tokenize it.

The quantization-quality evidence (VERDICT r2 next #4) needs a model at the
0.44B bench scale trained on enough tokens to have realistic weight/activation
distributions; the 3.6 MB round-2 corpus can't feed that. This harvests the
~500 MB of Python source shipped in site-packages (deduplicated, shuffled),
trains a BPE tokenizer on a sample, and writes uint16 train.bin/val.bin in the
same layout prepare_shakespeare.py produces — so the pretrain and
eval_quality CLIs consume it unchanged.

Chip recipe for the 0.44B ladder (a few hours at ~30k tok/s):
    python scripts/prepare_code_corpus.py --destination_path data/quality044
    python pretrain/shakespeare.py --data_dir data/quality044 \
        --out_dir out/quality044 --n_layer 8 --n_embd 2048 --n_head 16 \
        --block_size 2048 --vocab_size 8192 --batch_size 16 \
        --micro_batch_size 4 --max_iters 8000 --learning_rate 3e-4 \
        --eval_interval 1000 --eval_iters 20
    python scripts/eval_quality.py --ckpt_dir out/quality044/final \
        --data_dir data/quality044 --groupsize 128 --calib_block 1024
"""

import hashlib
import random
import sys
import time
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np

ROOTS = (
    "/opt/venv/lib/python3.12/site-packages",
    "/usr/lib/python3.12",
)


def collect_files(roots, max_file_kb: int) -> list:
    files = []
    for root in roots:
        root = Path(root)
        if not root.exists():
            continue
        for p in root.rglob("*.py"):
            if "__pycache__" in p.parts:
                continue
            try:
                size = p.stat().st_size
            except OSError:
                continue
            if 256 <= size <= max_file_kb * 1024:
                files.append(p)
    return files


def prepare(
    destination_path: Path = Path("data/quality044"),
    vocab_size: int = 8192,
    max_mb: int = 320,
    sample_mb: int = 8,
    val_fraction: float = 0.005,
    max_file_kb: int = 512,
    seed: int = 0,
) -> None:
    """Build the code corpus and tokenize it.

    Args:
        destination_path: Output directory (tokenizer.model, train.bin, val.bin).
        vocab_size: BPE vocabulary size (matches the 0.44B bench config).
        max_mb: Corpus size cap in MB of raw text.
        sample_mb: Text sample used to train the tokenizer.
        val_fraction: Fraction of tokens held out as val.bin.
        max_file_kb: Skip files larger than this (generated code).
        seed: File shuffle seed.
    """
    from lit_llama_tpu.data.tokenizer import Tokenizer

    dest = Path(destination_path)
    dest.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    files = collect_files(ROOTS, max_file_kb)
    rng = random.Random(seed)
    rng.shuffle(files)
    print(f"{len(files)} candidate files ({time.time()-t0:.0f}s)", flush=True)

    seen = set()
    parts, total = [], 0
    cap = max_mb * 1024 * 1024
    for p in files:
        try:
            data = p.read_bytes()
        except OSError:
            continue
        h = hashlib.sha1(data).digest()
        if h in seen:
            continue
        seen.add(h)
        text = data.decode("utf-8", errors="ignore")
        parts.append(text)
        total += len(text)
        if total >= cap:
            break
    corpus = "\n\n".join(parts)
    del parts
    print(f"corpus: {total/1e6:.0f} MB from {len(seen)} files", flush=True)

    sample_path = dest / "_tok_sample.txt"
    sample_path.write_text(corpus[: sample_mb * 1024 * 1024])
    t0 = time.time()
    Tokenizer.train(str(sample_path), str(dest), vocab_size)
    sample_path.unlink()
    print(f"tokenizer trained ({time.time()-t0:.0f}s)", flush=True)
    tok = Tokenizer(dest / "tokenizer.model")

    # chunked encode (newline-aligned) to bound peak memory
    t0 = time.time()
    ids_parts = []
    chunk = 8 * 1024 * 1024
    i = 0
    while i < len(corpus):
        j = min(i + chunk, len(corpus))
        if j < len(corpus):
            nl = corpus.rfind("\n", i, j)
            if nl > i:
                j = nl
        ids_parts.append(tok.encode(corpus[i:j], bos=False).astype(np.uint16))
        i = j
        done = sum(len(a) for a in ids_parts)
        print(f"  encoded {i/1e6:.0f}/{len(corpus)/1e6:.0f} MB "
              f"({done/1e6:.1f}M tokens, {time.time()-t0:.0f}s)", flush=True)
    ids = np.concatenate(ids_parts)
    n_val = max(1, int(len(ids) * val_fraction))
    ids[:-n_val].tofile(dest / "train.bin")
    ids[-n_val:].tofile(dest / "val.bin")
    print(f"train {len(ids)-n_val:,} tokens, val {n_val:,} tokens")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(prepare)
