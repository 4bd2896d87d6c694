"""Stage framework + checkpoint/resume tests (pipeline/stage.cpp:143-203,
SavesPolicy semantics)."""

import os

import numpy as np
import pytest

DATASET = "/root/reference/assembler/test_dataset"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(DATASET), reason="toy dataset unavailable")]


def run_cli(argv):
    from spades_for_blackbird_tpu import cli
    return cli.main(argv)


def test_stop_after_and_continue(tmp_path):
    out = str(tmp_path / "out")
    # run to k21 and stop
    rc = run_cli(["--test", "-o", out, "-k", "21,33", "--only-assembler",
                  "--stop-after", "k21"])
    assert rc == 0
    assert os.path.exists(f"{out}/saves/checkpoint.dat")
    assert open(f"{out}/saves/checkpoint.dat").read() == "k21"
    assert not os.path.exists(f"{out}/contigs.fasta")

    # continue to the end
    rc = run_cli(["--test", "-o", out, "-k", "21,33", "--only-assembler",
                  "--continue"])
    assert rc == 0
    contigs = open(f"{out}/contigs.fasta").read()
    assert contigs.startswith(">NODE_1_length_1000_cov_")
    log = open(f"{out}/spades.log").read()
    assert "resuming from saves of stage 'k21'" in log
    # k21 must not run twice
    assert log.count("== STAGE k21\n") == 1


def test_restart_from(tmp_path):
    out = str(tmp_path / "out")
    rc = run_cli(["--test", "-o", out, "-k", "21", "--only-assembler"])
    assert rc == 0
    first = open(f"{out}/contigs.fasta").read()
    # restart from repeat_resolution using the kept k21 saves
    rc = run_cli(["--test", "-o", out, "-k", "21", "--only-assembler",
                  "--restart-from", "repeat_resolution"])
    assert rc == 0
    assert open(f"{out}/contigs.fasta").read() == first


def test_restart_from_unknown_stage(tmp_path):
    out = str(tmp_path / "out")
    rc = run_cli(["--test", "-o", out, "-k", "21", "--only-assembler",
                  "--restart-from", "bogus"])
    assert rc == 2


def test_context_roundtrip(tmp_path):
    from spades_for_blackbird_tpu.pipeline.stages import PipelineContext
    from spades_for_blackbird_tpu.graph import construct
    from spades_for_blackbird_tpu.ops import dna

    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=200))
    codes, lengths = dna.encode_reads([genome])
    g = construct.graph_from_reads(codes, lengths, 15)

    ctx = PipelineContext()
    ctx.codes, ctx.lengths = codes, lengths
    ctx.graph = g
    ctx.read_length = 200
    ctx.contigs = [("ACGT", 1.5)]
    ctx.params = {"ks_done": [15]}
    d = str(tmp_path / "save")
    ctx.save(d)
    ctx2 = PipelineContext.load(d)
    assert (np.asarray(ctx2.codes) == codes).all()
    assert ctx2.graph.k == 15
    assert (np.asarray(ctx2.graph.seq_flat) ==
            np.asarray(g.seq_flat)).all()
    assert ctx2.contigs == [("ACGT", 1.5)]
    assert ctx2.params == {"ks_done": [15]}


def test_only_error_correction_writes_corrected_reads(tmp_path):
    from spades_for_blackbird_tpu import cli
    from spades_for_blackbird_tpu.io import fastq
    out = str(tmp_path / "out")
    rc = run_cli(["--test", "-o", out, "--only-error-correction"])
    assert rc == 0
    corrected = f"{out}/corrected/corrected.fastq.gz"
    assert os.path.exists(corrected)
    b = fastq.load_reads(corrected)
    assert b.num_reads == 4108
    assert not os.path.exists(f"{out}/contigs.fasta")


def test_mode_wrapper_entry_points(tmp_path):
    from spades_for_blackbird_tpu import cli
    out = str(tmp_path / "out")
    # wrapper injects the mode flag; conflicting explicit flag errors
    rc = cli.main_meta(["--test", "-o", out, "--rna"])
    assert rc == 2
