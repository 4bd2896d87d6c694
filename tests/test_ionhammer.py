"""IonHammer-equivalent homopolymer correction tests."""

import numpy as np
import pytest

from spades_for_blackbird_tpu.hammer import ionhammer
from spades_for_blackbird_tpu.ops import dna


def genome_with_homopolymers(seed, n_units=120):
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(n_units):
        base = "ACGT"[int(rng.integers(4))]
        run = int(rng.integers(1, 5))
        parts.append(base * run)
    # collapse accidental equal neighbors
    s = "".join(parts)
    return s


def test_hp_compress_roundtrip():
    s = "AAACCGTTTTA"
    codes, lengths = dna.encode_reads([s])
    b, r, cl = ionhammer.hp_compress(codes, lengths)
    assert dna.decode_codes(b[0][:cl[0]]) == "ACGTA"
    assert list(r[0][:cl[0]]) == [3, 2, 1, 4, 1]
    back, blen = ionhammer.hp_decompress(b, r, cl, len(s))
    assert dna.decode_codes(back[0][:blen[0]]) == s


def test_homopolymer_run_errors_fixed():
    genome = genome_with_homopolymers(1)
    L = 60
    reads = [genome[i:i + L] for i in range(0, len(genome) - L + 1, 2)]
    # inject run-length errors: expand/contract one run in some reads
    rng = np.random.default_rng(2)
    bad_idx = []
    bad_reads = []
    for j in range(8):
        r = reads[int(rng.integers(len(reads)))]
        # find a homopolymer run of length >=2 and shrink it by 1
        import re
        runs = [(m.start(), m.end()) for m in re.finditer(r"(.)\1+", r)]
        if not runs:
            continue
        s_, e_ = runs[len(runs) // 2]
        bad = r[:s_] + r[s_:e_ - 1] + r[e_:]
        bad_reads.append((bad, r))
    all_reads = reads + [b for b, _ in bad_reads]
    codes, lengths = dna.encode_reads(all_reads)
    out_codes, out_lengths, stats = ionhammer.correct_reads_ion(
        codes, lengths)
    assert stats["changed_runs"] >= 1
    fixed = 0
    for i, (bad, orig) in enumerate(bad_reads):
        idx = len(reads) + i
        got = dna.decode_codes(out_codes[idx][:out_lengths[idx]])
        if got == orig:
            fixed += 1
    assert fixed >= len(bad_reads) - 1, f"{fixed}/{len(bad_reads)}"


def test_cli_iontorrent_flag(tmp_path):
    """--iontorrent routes error correction through ionhammer
    (options_storage.py iontorrent flag -> ionhammer binary)."""
    from spades_for_blackbird_tpu import cli
    genome = genome_with_homopolymers(5)
    L = 60
    reads = [genome[i:i + L] for i in range(0, len(genome) - L + 1, 3)]
    f = tmp_path / "reads.fastq"
    with open(f, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    out = tmp_path / "out"
    rc = cli.main(["-s", str(f), "-o", str(out), "--iontorrent",
                   "--only-error-correction"])
    assert rc == 0
    log = (out / "spades.log").read_text()
    assert "ionhammer" in log
