"""Tokenize RedPajama jsonl into PackedDataset chunk files
(reference: scripts/prepare_redpajama.py:45-150 — sample and full variants, zstd
common_crawl handling, chunks of 2049*1024 tokens).

Derived from lit-llama's ``prepare_redpajama.py`` (Apache-2.0, LICENSE at repo
root): the ``filename_sets`` corpus-layout table and per-file loop skeleton
are retained; tokenization and chunk writing target this repo's Tokenizer and
PackedDatasetBuilder.
"""

import glob
import json
import os
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np

filenames_sample = [
    "arxiv_sample.jsonl",
    "book_sample.jsonl",
    "c4_sample.jsonl",
    "cc_2019-30_sample.jsonl",
    "cc_2020-05_sample.jsonl",
    "cc_2021-04_sample.jsonl",
    "cc_2022-05_sample.jsonl",
    "cc_2023-06_sample.jsonl",
    "github_sample.jsonl",
    "stackexchange_sample.jsonl",
    "wikipedia_sample.jsonl",
]

filename_sets = {
    "arxiv": "arxiv/arxiv*",
    "book": "book/book*",
    "c4": "c4/c4-train*",
    "common_crawl": "common_crawl/*",
    "github": "github/filtered*",
    "stackexchange": "stackexchange/stackexchange*",
    "wikipedia": "wikipedia/wiki*",
}


def prepare_sample(source_path: Path, tokenizer_path: Path, destination_path: Path, chunk_size: int) -> None:
    """Tokenize the RedPajama-1T-Sample jsonl files (reference: :45-90)."""
    from lit_llama_tpu.data.packed_dataset import PackedDatasetBuilder
    from lit_llama_tpu.data.tokenizer import Tokenizer

    destination_path.mkdir(parents=True, exist_ok=True)
    tokenizer = Tokenizer(tokenizer_path)
    for name in filenames_sample:
        filepath = source_path / name
        if not filepath.is_file():
            raise RuntimeError(
                f"Input file not found at {filepath}. Place the RedPajama-Data-1T-Sample files there."
            )
        prefix, _ = os.path.splitext(name)
        builder = PackedDatasetBuilder(
            outdir=str(destination_path),
            prefix=prefix,
            chunk_size=chunk_size,
            sep_token=tokenizer.bos_id,
            dtype="auto",
            vocab_size=tokenizer.vocab_size,
        )
        print(f"Processing {name}")
        with open(filepath, encoding="utf-8") as f:
            for row in f:
                text = json.loads(row)["text"]
                builder.add_array(tokenizer.encode(text, bos=False, eos=True))
        builder.write_reminder()


def prepare_full(
    source_path: Path, tokenizer_path: Path, destination_path: Path, chunk_size: int, match: str = ""
) -> None:
    """Tokenize the full RedPajama set, one PackedDataset per source
    (reference: :93-150; common_crawl is zstd-compressed jsonl)."""
    import zstandard as zstd

    from lit_llama_tpu.data.packed_dataset import PackedDatasetBuilder
    from lit_llama_tpu.data.tokenizer import Tokenizer

    destination_path.mkdir(parents=True, exist_ok=True)
    tokenizer = Tokenizer(tokenizer_path)
    for set_name, pattern in filename_sets.items():
        if match and match not in set_name:
            continue
        is_cc = set_name == "common_crawl"
        filenames = sorted(glob.glob(str(source_path / pattern), recursive=True))
        if not filenames:
            raise RuntimeError(f"No files matched {pattern} under {source_path}.")
        builder = PackedDatasetBuilder(
            outdir=str(destination_path),
            prefix=set_name,
            chunk_size=chunk_size,
            sep_token=tokenizer.bos_id,
            dtype="auto",
            vocab_size=tokenizer.vocab_size,
        )
        for name in filenames:
            print(f"Processing {name}")
            if is_cc:
                with zstd.open(open(name, "rb"), "rt", encoding="utf-8") as f:
                    for row in f:
                        builder.add_array(
                            tokenizer.encode(json.loads(row)["text"], bos=False, eos=True)
                        )
            else:
                with open(name, encoding="utf-8") as f:
                    for row in f:
                        builder.add_array(
                            tokenizer.encode(json.loads(row)["text"], bos=False, eos=True)
                        )
        builder.write_reminder()


def prepare(
    source_path: Path = Path("data/RedPajama-Data-1T-Sample"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    destination_path: Path = Path("data/red_pajama_sample"),
    chunk_size: int = 2049 * 1024,
    sample: bool = False,
    match: str = "",
) -> None:
    """Tokenize RedPajama into LITPKDS chunk files.

    Args:
        source_path: Directory with the raw jsonl files.
        tokenizer_path: SentencePiece tokenizer model.
        destination_path: Output directory for .bin chunk files.
        chunk_size: Tokens per chunk (reference: 2049*1024, i.e. 1024 blocks of 2048+1).
        sample: Process the 1T-Sample file list instead of the full set.
        match: Only process full-set sources whose name contains this substring.
    """
    source_path, tokenizer_path, destination_path = (
        Path(source_path),
        Path(tokenizer_path),
        Path(destination_path),
    )
    if sample:
        prepare_sample(source_path, tokenizer_path, destination_path, chunk_size)
    else:
        prepare_full(source_path, tokenizer_path, destination_path, chunk_size, match)


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(prepare)
