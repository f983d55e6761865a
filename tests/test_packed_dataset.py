"""PackedDataset tests (mirrors the reference's strategy: build real tiny chunk
files in-test, assert round-trips, shuffling, wrap, rank sharding —
tests/test_packed_dataset.py:10-205)."""

import numpy as np
import pytest

from lit_llama_tpu.data.packed_dataset import (
    HDR_SIZE,
    CombinedDataset,
    PackedDataset,
    PackedDatasetBuilder,
    batcher,
    read_header,
)


@pytest.fixture
def chunk_dir(tmp_path):
    return tmp_path


def build_chunks(outdir, n_arrays=6, arr_len=24, chunk_size=48, vocab=100, prefix="ds"):
    builder = PackedDatasetBuilder(
        outdir=str(outdir), prefix=prefix, chunk_size=chunk_size, sep_token=0,
        dtype="auto", vocab_size=vocab,
    )
    arrays = [np.arange(i * arr_len, (i + 1) * arr_len, dtype=np.uint16) for i in range(n_arrays)]
    for a in arrays:
        builder.add_array(a)
    builder.write_reminder()
    return builder, arrays


def test_builder_header_and_dtype(chunk_dir):
    builder, _ = build_chunks(chunk_dir)
    assert builder.dtype == np.uint16  # vocab < 65500 -> uint16 (reference :80-88)
    for f in builder.filenames:
        dtype, chunk_size = read_header(f)
        assert dtype == np.uint16 and chunk_size == 48


def test_roundtrip_contents(chunk_dir):
    builder, arrays = build_chunks(chunk_dir)
    ds = PackedDataset(builder.filenames, n_chunks=1, block_size=12, shuffle=False)
    got = np.concatenate(list(iter(ds)))
    expected = np.concatenate(arrays)
    np.testing.assert_array_equal(got[: len(expected)], expected)


def test_reference_file_compat(chunk_dir):
    """A chunk written by the reference's builder byte-format loads here."""
    import struct

    arr = np.arange(48, dtype=np.uint16)
    path = chunk_dir / "ref_0000000000.bin"
    with open(path, "wb") as f:
        f.write(b"LITPKDS")
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<B", 8))  # uint16 code
        f.write(struct.pack("<Q", 48))
        f.write(arr.tobytes())
    assert path.stat().st_size == HDR_SIZE + arr.nbytes
    ds = PackedDataset([path], n_chunks=1, block_size=16, shuffle=False)
    got = np.concatenate(list(iter(ds)))
    np.testing.assert_array_equal(got, arr)


def test_shuffle_is_deterministic_and_complete(chunk_dir):
    builder, arrays = build_chunks(chunk_dir)
    ds1 = PackedDataset(builder.filenames, n_chunks=3, block_size=12, shuffle=True, seed=7)
    ds2 = PackedDataset(builder.filenames, n_chunks=3, block_size=12, shuffle=True, seed=7)
    a = [b.tolist() for b in iter(ds1)]
    b = [b.tolist() for b in iter(ds2)]
    assert a == b
    flat = sorted(x for blk in a for x in blk)
    expected = sorted(np.concatenate(arrays).tolist())
    assert flat == expected


def test_wrap_repeats(chunk_dir):
    builder, _ = build_chunks(chunk_dir)
    ds = PackedDataset(builder.filenames, n_chunks=3, block_size=12, shuffle=False, wrap=True)
    it = iter(ds)
    n_blocks_total = 3 * (48 // 12)
    first_pass = [next(it) for _ in range(n_blocks_total)]
    wrapped = [next(it) for _ in range(2)]  # does not raise
    np.testing.assert_array_equal(wrapped[0], first_pass[0])


def test_rank_sharding_assigns_files_round_robin(chunk_dir):
    """Which files each (world_size, rank) sees — the reference's core
    distribution-correctness test (tests/test_packed_dataset.py:174-205)."""
    builder, _ = build_chunks(chunk_dir, n_arrays=10, chunk_size=24)
    files = builder.filenames
    world = 2
    seen = {}
    for rank in range(world):
        ds = PackedDataset(
            files, n_chunks=1, block_size=12, shuffle=False,
            num_processes=world, process_rank=rank,
        )
        it = iter(ds)
        seen[rank] = it._filenames
    n_files = len(files) // world * world
    assert seen[0] == files[0:n_files:2]
    assert seen[1] == files[1:n_files:2]
    assert not (set(seen[0]) & set(seen[1]))


def test_worker_sharding_composes_with_rank(chunk_dir):
    builder, _ = build_chunks(chunk_dir, n_arrays=16, chunk_size=24)
    files = builder.filenames
    shards = []
    for rank in range(2):
        for worker in range(2):
            ds = PackedDataset(
                files, n_chunks=1, block_size=12, shuffle=False,
                num_processes=2, process_rank=rank, num_workers=2, worker_id=worker,
            )
            shards.append(tuple(iter(ds)._filenames))
    all_files = [f for s in shards for f in s]
    assert len(all_files) == len(set(all_files))  # disjoint


def test_combined_dataset_weights():
    a = iter_fn([np.zeros(4, np.int32)] * 200)
    b = iter_fn([np.ones(4, np.int32)] * 200)
    combined = CombinedDataset([a, b], seed=0, weights=[0.9, 0.1])
    vals = [int(next(iter(combined))[0]) for _ in range(1)]
    it = iter(combined)
    vals = [int(next(it)[0]) for _ in range(100)]
    assert vals.count(0) > vals.count(1)


def iter_fn(blocks):
    class _D:
        def __iter__(self):
            return iter(list(blocks))

    return _D()


def test_batcher_shapes(chunk_dir):
    builder, _ = build_chunks(chunk_dir)
    ds = PackedDataset(builder.filenames, n_chunks=1, block_size=12, shuffle=False)
    batch = next(batcher(ds, batch_size=2, accum_steps=2))
    assert batch.shape == (2, 2, 12)
    assert batch.dtype == np.int32
