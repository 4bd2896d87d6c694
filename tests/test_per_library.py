"""Per-library model tests (pair_info_count.cpp:186-230 per-lib IS
estimation, library.hpp orientations): a mixed PE(IS~215)+MP(IS~3000)
dataset must recover BOTH insert-size distributions and use both in
repeat resolution; FF-oriented libraries must convert to FR geometry.
"""

import numpy as np
import pytest

import naive_debruijn as nd


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def write_pairs(genome, path1, path2, IS, L, step, orientation="fr",
                seed_tag=""):
    n = 0
    with open(path1, "w") as f1, open(path2, "w") as f2:
        for pos in range(0, len(genome) - IS + 1, step):
            fr1 = genome[pos:pos + L]
            fr2 = nd.rc(genome[pos + IS - L:pos + IS])
            if orientation == "rf":
                fr1, fr2 = nd.rc(fr1), nd.rc(fr2)
            elif orientation == "ff":
                fr2 = nd.rc(fr2)
            f1.write(f"@{seed_tag}p{n}/1\n{fr1}\n+\n{'I' * L}\n")
            f2.write(f"@{seed_tag}p{n}/2\n{fr2}\n+\n{'I' * L}\n")
            n += 1
    return n


def parse_lib_data(path):
    libs = []
    for line in open(path):
        line = line.strip()
        if line.startswith("- lib:"):
            libs.append({})
        elif ":" in line and libs:
            key, val = line.split(":", 1)
            libs[-1][key.strip()] = val.strip()
    return libs


def test_mixed_pe_mp_recovers_both_insert_sizes(tmp_path):
    from spades_for_blackbird_tpu import cli

    genome = random_dna(5000, 11)
    pe1, pe2 = tmp_path / "pe_1.fq", tmp_path / "pe_2.fq"
    mp1, mp2 = tmp_path / "mp_1.fq", tmp_path / "mp_2.fq"
    write_pairs(genome, pe1, pe2, IS=215, L=50, step=4, seed_tag="pe")
    write_pairs(genome, mp1, mp2, IS=3000, L=50, step=25,
                orientation="rf", seed_tag="mp")
    out = tmp_path / "out"
    rc_code = cli.main(["-1", str(pe1), "-2", str(pe2),
                        "--mp-1", str(mp1), "--mp-2", str(mp2),
                        "-o", str(out), "-k", "21", "--only-assembler"])
    assert rc_code == 0

    libs = parse_lib_data(str(out / "final.lib_data"))
    assert len(libs) == 2
    by_kind = {l["kind"]: l for l in libs}
    assert set(by_kind) == {"pe", "mp"}
    is_pe = float(by_kind["pe"]["insert_size_median"])
    is_mp = float(by_kind["mp"]["insert_size_median"])
    assert abs(is_pe - 215) <= 10, is_pe
    assert abs(is_mp - 3000) <= 60, is_mp

    from spades_for_blackbird_tpu.io import fastq as fq
    _, contigs = fq.read_sequences(str(out / "contigs.fasta"))
    for s in contigs:
        assert s in genome or nd.rc(s) in genome


def test_ff_orientation_converts_to_fr(tmp_path):
    from spades_for_blackbird_tpu import cli

    genome = random_dna(1200, 13)
    pe1, pe2 = tmp_path / "ff_1.fq", tmp_path / "ff_2.fq"
    write_pairs(genome, pe1, pe2, IS=300, L=50, step=3,
                orientation="ff", seed_tag="ff")
    out = tmp_path / "out"
    rc_code = cli.main(["-1", str(pe1), "-2", str(pe2),
                        "--pe-orientation", "ff",
                        "-o", str(out), "-k", "21", "--only-assembler"])
    assert rc_code == 0
    # insert size is only recoverable if the FF->FR conversion is right
    libs = parse_lib_data(str(out / "final.lib_data"))
    assert len(libs) == 1
    assert abs(float(libs[0]["insert_size_median"]) - 300) <= 10
    from spades_for_blackbird_tpu.io import fastq as fq
    _, contigs = fq.read_sequences(str(out / "contigs.fasta"))
    assert contigs, "no contigs"
    for s in contigs:
        assert s in genome or nd.rc(s) in genome
