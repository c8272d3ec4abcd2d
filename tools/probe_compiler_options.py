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
       (no args: probes the built-in candidate list)
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


def main():
    import jax
    import jax.numpy as jnp

    pairs = (
        [tuple(a.split("=", 1)) for a in sys.argv[1:]]
        if len(sys.argv) > 1
        else CANDIDATES
    )
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
