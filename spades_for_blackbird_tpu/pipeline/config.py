"""Layered assembly configuration with mode overlays.

Replaces the reference's stacked ``.info`` property-tree config
(common/pipeline/config_struct.{hpp,cpp} ``load_cfg_from_files`` over
configs/debruijn/config.info + <mode>_mode.info + simplification.info;
pipeline mode enum at config_struct.hpp:38-50): a base dataclass plus
per-mode overlay functions mirroring the reference's mode files.

Supported modes (configs/debruijn/*_mode.info):
isolate (base), meta, plasmid, metaplasmid, rna, single-cell (sc).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from ..simplify.runner import SimplifyConfig
from ..path_extend.resolver import PEParams


MODES = ("isolate", "meta", "plasmid", "metaplasmid", "rna", "sc", "bio")


@dataclass
class AssemblyConfig:
    mode: str = "isolate"
    ks: list[int] | None = None          # None = auto ladder
    careful: bool = False
    min_contig_length: int | None = None
    correction_enabled: bool = True      # hammer
    simplify: SimplifyConfig = field(default_factory=SimplifyConfig)
    pe: PEParams = field(default_factory=PEParams)
    # meta (meta_mode.info): two-step repeat resolution with intermediate
    # contigs re-fed as a trusted library
    two_step_rr: bool = False
    use_intermediate_contigs: bool = False
    # plasmid (plasmid_mode.info + projects/spades/chromosome_removal.cpp)
    chromosome_removal: bool = False
    circular_output: bool = False
    plasmid_min_edge_length: int = 1000
    plasmid_coverage_uniformity: float = 0.3
    # rna (rna_mode.info): strand-specific coverage machinery
    strand_specific: bool = False
    # bio (bgc_mode.info): HMM domain matching + restricted-edge masking
    domain_matching: bool = False
    # meta/MDA (config_struct uneven_depth): EC threshold from the
    # graph-based finder instead of the spectrum mixture fit
    # (genomic_info_filler.cpp:31-45)
    uneven_depth: bool = False


def _meta(cfg: AssemblyConfig) -> AssemblyConfig:
    # meta_mode.info: cycle_iter_count 3, ec "{ec_lb 30, icb 2.5}",
    # harsher tip clipping, two-step RR; rcc block (meta_mode.info:38-47:
    # gap 5, length_coeff 3, tips_coeff 5, vcnt 100, ec_len 300, no max
    # cov); red disconnector (:56-61 diff_mult 10, unconditional 50);
    # meta hidden-EC remover (simplification.cpp:319, relative 3)
    simp = replace(cfg.simplify, rounds=3, ec_icb=2.5, ec_lb_additive=30,
                   rcc_enabled=True, rcc_coverage_gap=5.0,
                   rcc_length_coeff=3.0, rcc_tip_allowing_coeff=5.0,
                   rcc_vertex_limit=100, rcc_max_ec_len_additive=300,
                   rcc_max_coverage_coeff=-1.0,
                   red_enabled=True, red_diff_mult=10.0,
                   red_unconditional_diff_mult=50.0,
                   her_meta=True, her_relative_threshold=3.0)
    return replace(cfg, mode="meta", two_step_rr=True,
                   use_intermediate_contigs=True, simplify=simp,
                   uneven_depth=True)


def _plasmid(cfg: AssemblyConfig) -> AssemblyConfig:
    return replace(cfg, mode="plasmid", chromosome_removal=True,
                   circular_output=True)


def _metaplasmid(cfg: AssemblyConfig) -> AssemblyConfig:
    cfg = _meta(cfg)
    return replace(cfg, mode="metaplasmid", chromosome_removal=True,
                   circular_output=True)


def _rna(cfg: AssemblyConfig) -> AssemblyConfig:
    # rna_mode.info: K ladder [33, 49] (options_storage.py K_MERS_RNA),
    # strand-specific coverage machinery + superbubble collapse;
    # tip condition "{ mmm 3 tc_lb 4, cb 100000, rctc 0.5 }
    # { tc_lb 2, cb 1, rctc 10000 }" (rna_mode.info:56) and the
    # low-complexity AT edge/tip clippers (rna_simplification.hpp)
    simp = replace(cfg.simplify, superbubble_enabled=True,
                   tip_clauses=((4.0, 100000.0, 0.5, 3.0),
                                (2.0, 1.0, 10000.0)),
                   low_complexity_enabled=True)
    return replace(cfg, mode="rna", ks=cfg.ks or [33, 49],
                   strand_specific=True, simplify=simp)


def _sc(cfg: AssemblyConfig) -> AssemblyConfig:
    # careful single-cell (mda_mode.info): uneven coverage -> gentler EC
    # thresholds; rcc (mda_mode.info:39-48: gap 10, lengths 2/3, vcnt 30,
    # max_cov_coeff 5); hidden-EC remover (:57-63: unreliability 0.2,
    # relative 5)
    simp = replace(cfg.simplify, ec_icb=1.2,
                   rcc_enabled=True, rcc_coverage_gap=10.0,
                   rcc_length_coeff=2.0, rcc_tip_allowing_coeff=3.0,
                   rcc_vertex_limit=30, rcc_max_ec_len_additive=30,
                   rcc_max_coverage_coeff=5.0,
                   her_enabled=True, her_unreliability_coeff=0.2,
                   her_relative_threshold=5.0,
                   tec_enabled=True)
    return replace(cfg, mode="sc", simplify=simp, uneven_depth=True)


def _bio(cfg: AssemblyConfig) -> AssemblyConfig:
    # biosyntheticSPAdes (bgc_mode.info): two-step RR with domain
    # extraction on preliminary contigs and restricted-edge protection
    # in the second phase (pipeline.cpp:140-153)
    return replace(cfg, mode="bio", two_step_rr=True,
                   use_intermediate_contigs=True, domain_matching=True)


_OVERLAYS = {
    "isolate": lambda c: c,
    "meta": _meta,
    "plasmid": _plasmid,
    "metaplasmid": _metaplasmid,
    "rna": _rna,
    "sc": _sc,
    "bio": _bio,
}


def config_for_mode(mode: str = "isolate", **overrides) -> AssemblyConfig:
    if mode not in _OVERLAYS:
        raise ValueError(f"unknown mode {mode!r}; choose from {MODES}")
    cfg = _OVERLAYS[mode](AssemblyConfig())
    if overrides:
        cfg = replace(cfg, **overrides)
    return cfg
