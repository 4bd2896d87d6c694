"""Native binary read store: convert, chunked reload, out-of-core count."""

import gzip

import numpy as np
import pytest

import naive_debruijn as nd
from spades_for_blackbird_tpu.io import fastq, read_store
from spades_for_blackbird_tpu.ops import dna

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def write_fastq_gz(path, reads):
    with gzip.open(path, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def test_store_roundtrip(tmp_path):
    genome = random_dna(300, 1)
    reads = [genome[i:i + 60] for i in range(0, 240, 3)]
    reads += [genome[i:i + 45] for i in range(0, 255, 5)]  # mixed lengths
    p1 = str(tmp_path / "a.fastq.gz")
    p2 = str(tmp_path / "b.fasta")
    write_fastq_gz(p1, reads[:50])
    (tmp_path / "b.fasta").write_text("".join(
        f">s{i}\n{r}\n" for i, r in enumerate(reads[50:])))
    sp = str(tmp_path / "reads.store")
    store = read_store.ReadStore.convert([p1, p2], sp, chunk_reads=16)
    assert store.num_reads == len(reads)
    assert store.max_len == max(len(r) for r in reads)
    assert store.num_chunks == -(-len(reads) // 16)
    got = []
    for ci in range(store.num_chunks):
        codes, lengths = store.load_chunk(ci)
        for r in range(16):
            if ci * 16 + r >= store.num_reads:
                assert lengths[r] == 0
                continue
            got.append(dna.decode_codes(codes[r, :lengths[r]]))
    assert got == reads


def test_store_python_fallback_parity(tmp_path):
    reads = [random_dna(50, s) for s in range(20)]
    p = str(tmp_path / "r.fastq.gz")
    write_fastq_gz(p, reads)
    sp_native = str(tmp_path / "n.store")
    sp_py = str(tmp_path / "p.store")
    read_store.ReadStore.convert([p], sp_native, chunk_reads=8)
    read_store.ReadStore._convert_py([p], sp_py, 8)
    assert open(sp_native, "rb").read() == open(sp_py, "rb").read()
    s = read_store.ReadStore(sp_py)
    c1, l1 = s.load_chunk(1)
    c2, l2 = s._load_chunk_py(1, np.full_like(c1, 4), np.zeros_like(l1))
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(l1, l2)


def test_out_of_core_count_matches_in_memory(tmp_path):
    genome = random_dna(500, 2)
    reads = [genome[i:i + 70] for i in range(0, 430, 2)]
    p = str(tmp_path / "r.fastq.gz")
    write_fastq_gz(p, reads)
    sp = str(tmp_path / "r.store")
    store = read_store.ReadStore.convert([p], sp, chunk_reads=32)
    assert store.num_chunks > 3
    t = read_store.count_kmers_store(store, K)

    import jax.numpy as jnp
    from spades_for_blackbird_tpu.kmers import counter
    codes, lengths = dna.encode_reads(reads)
    want = counter.count_kmers(jnp.asarray(codes), jnp.asarray(lengths), K)
    n, wn = int(t.num), int(want.num)
    assert n == wn
    np.testing.assert_array_equal(np.asarray(t.kmers)[:n],
                                  np.asarray(want.kmers)[:wn])
    np.testing.assert_array_equal(np.asarray(t.counts)[:n],
                                  np.asarray(want.counts)[:wn])
