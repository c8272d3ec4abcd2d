#!/usr/bin/env python
"""Probe which XLA:TPU flag names the (possibly remote) compiler accepts.

``jax.jit(..., compiler_options={name: value})`` attaches env-option
overrides to the PJRT compile request. Through the axon remote-compile
tunnel an UNKNOWN flag name makes the compile helper exit non-zero (HTTP
500 surfaces as JaxRuntimeError), while a known flag compiles — so
validity is directly testable without any documentation for the deployed
compiler version. Round-3 probe results on this env's v5e toolchain (19
valid / 6 invalid) are recorded in BASELINE.md "Round 3: the compile-
options surface".

Usage: python tools/probe_compiler_options.py [name=value ...]
       (no args: probes the built-in candidate list;
        pass --extended to probe CANDIDATES_EXTENDED instead)
"""

from __future__ import annotations

import sys

CANDIDATES = [
    ("xla_tpu_scoped_vmem_limit_kib", "65536"),
    ("xla_tpu_enable_latency_hiding_scheduler", "true"),
    ("xla_tpu_enable_experimental_fusion_cost_model", "true"),
    ("xla_tpu_dot_dot_fusion", "true"),
    ("xla_tpu_rwb_fusion", "false"),
    ("xla_tpu_licm_size_inflation_ratio", "2"),
    ("xla_tpu_use_bundle_aware_cost_model_for_fusions", "true"),
    ("xla_tpu_reduce_loop_fusion_dup_with_unfusable_user", "true"),
    ("xla_tpu_enable_multi_level_nested_loop_fusion", "true"),
    ("xla_tpu_nd_short_transfer_max_chunks", "4096"),
    ("xla_tpu_enable_dot_strength_reduction", "false"),
    ("xla_tpu_allocate_scoped_vmem_at_same_offset", "false"),
    ("xla_tpu_async_copy_bandwidth_scaling_factor", "1.0"),
    ("xla_tpu_copy_fusion_pad_unpad_ratio", "0"),
    ("xla_tpu_dot_dot_fusion_duplicated", "true"),
    ("xla_tpu_layout_use_dot_grouping", "true"),
    ("xla_tpu_use_repeated_instance_for_preferred_prefetch_time", "true"),
    ("xla_jf_conv_full_precision", "true"),
    ("xla_tpu_order_dot_after_layout", "true"),
]

# Round-3 continuation: wider net over the copy/scheduler/MSA/loop-fusion
# families (the chunking win came from exactly this class). Names guessed
# from public openxla/libtpu flag surfaces — the probe exists because
# validity is only decidable empirically against the deployed toolchain.
CANDIDATES_EXTENDED = [
    ("xla_tpu_memory_bound_loop_optimizer", "true"),
    ("xla_tpu_enable_aggressive_loop_fusion_layout_opt", "true"),
    ("xla_tpu_vector_load_fusion_window", "2048"),
    ("xla_tpu_vector_store_fusion_window", "512"),
    ("xla_tpu_scavenge_vmem_for_fusions", "true"),
    ("xla_tpu_enable_vmem_to_vmem_dmas", "true"),
    ("xla_tpu_use_lp_llo_scheduler", "true"),
    ("xla_tpu_copy_elision_analysis_allowance", "1000000"),
    ("xla_tpu_copy_insertion_use_region_analysis_limit", "100000"),
    ("xla_tpu_enable_all_experimental_scheduler_features", "true"),
    ("xla_tpu_enable_scheduler_memory_pressure_tracking", "true"),
    ("xla_tpu_aggressive_opt_barrier_removal", "true"),
    ("xla_tpu_sliced_prefetch_max_slices", "16"),
    ("xla_tpu_msa_inefficient_use_to_copy_ratio", "0.5"),
    ("xla_tpu_prefetch_interval_picker_size_override", "268435456"),
    ("xla_tpu_enable_aggressive_broadcast_priority_update", "true"),
    ("xla_tpu_host_transfer_overlap_limit", "8"),
    ("xla_tpu_enable_data_parallel_all_reduce_opt", "true"),
    ("xla_tpu_data_parallel_opt_different_sized_ops", "true"),
    ("xla_latency_hiding_scheduler_rerun", "2"),
    ("xla_tpu_use_enhanced_launch_barrier", "true"),
    ("xla_tpu_perform_spmd_cse_prevention", "false"),
    ("xla_tpu_dge_option", "DGE_OFF"),
    ("xla_tpu_use_minor_loop_fusion", "true"),
    ("xla_tpu_enable_window_prefetch", "true"),
]


def main():
    import jax
    import jax.numpy as jnp

    argv = sys.argv[1:]
    if argv == ["--extended"]:
        pairs = CANDIDATES_EXTENDED
    elif argv:
        pairs = [tuple(a.split("=", 1)) for a in argv]
    else:
        pairs = CANDIDATES
    x = jnp.ones((256, 256), jnp.bfloat16)
    ok, bad = [], []
    for name, val in pairs:
        try:
            r = jax.jit(lambda a: a @ a, compiler_options={name: val})(x)
            jax.block_until_ready(r)
            ok.append(name)
            print(f"VALID   {name}={val}", flush=True)
        except Exception as e:
            bad.append(name)
            print(f"INVALID {name}={val}  ({type(e).__name__})", flush=True)
    print(f"\n{len(ok)} valid, {len(bad)} invalid")


if __name__ == "__main__":
    main()
