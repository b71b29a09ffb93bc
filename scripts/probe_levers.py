"""On-chip probe of the round-2 open perf levers (VERDICT r2 ask #5).

Target: the neighbor-reduction einsum `rkh,rkF->rhF` — the measured
bottleneck of the conv stack (PERF.md: R=12800 batch elements of
[145x32x392], 14.5 ms, ~2% MXU utilization, per-tiny-matmul pipeline
overhead).

Measurement technique: N=16 dependent iterations of the op inside ONE
jitted fori_loop (each iteration's operand is perturbed by a function of
the previous output, so XLA cannot CSE and the axon tunnel cannot dedupe
repeated dispatches — isolated sub-ms repeat dispatches through the
tunnel report impossibly fast times). Reported per-op time = block time
/ N.

Levers measured against the bf16 baseline at bench shapes:
  1. int8 quantized operands (v5e MXU has 2x int8 throughput)
  2. fp8 (e4m3) operands (if unsupported, XLA upcasts - also data)
  3. jax.lax.ragged_dot grouped-matmul formulation - the "zero-skipping
     grouped-matmul primitive" PERF.md's K-merge dead-end asked for:
     groups = batch elements, uniform group size H

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_levers.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

R, K, H, F = 12800, 32, 145, 392
N_ITER = 64

rng = np.random.RandomState(0)
h_np = rng.randn(R, K, H).astype(np.float32)
f_np = rng.randn(R, K, F).astype(np.float32)

h_bf = jnp.asarray(h_np, jnp.bfloat16)
f_bf = jnp.asarray(f_np, jnp.bfloat16)


def chain_time(name, make_loop, args_warm, args_timed):
    """Compile + run a jitted N_ITER dependent loop; report per-op ms.

    Two tunnel traps this works around (both produce impossibly fast
    timings if ignored):
    - `jax.block_until_ready` does NOT synchronize through the axon
      tunnel — only a device->host transfer does, so the scalar
      accumulator is pulled to numpy inside the timed region.
    - the tunnel memoizes repeated identical (program, args) executions,
      so the timed call uses DIFFERENT operand values than the warm-up
      call. One timed call of the N_ITER-iteration loop totals >1 s of
      real chip work — far above the tunnel-timing reliability bar."""
    fn = jax.jit(make_loop)
    np.asarray(fn(*args_warm))  # compile + warm (host transfer = sync)
    t0 = time.time()
    np.asarray(fn(*args_timed))
    dt = (time.time() - t0) / N_ITER * 1e3
    print(f"{name:34s} {dt:8.2f} ms/op", flush=True)
    return dt


def loop_bf16(h, f):
    def body(i, carry):
        acc, h = carry
        out = jnp.einsum("rkh,rkF->rhF", h, f)
        # NONLINEAR reduce over the WHOLE output: sum(out) alone is
        # algebraically rewritten to dot(sum_h, sum_F) (matmul eliminated),
        # and consuming a single element slices the contraction (DCE)
        s = jnp.sum(jnp.square(out.astype(jnp.float32)))
        # output-dependent perturbation: defeats CSE / dispatch dedup
        h = h + s.astype(jnp.bfloat16) * jnp.bfloat16(1e-12)
        return acc + s * 1e-9, h

    acc, _ = jax.lax.fori_loop(0, N_ITER, body, (jnp.float32(0), h))
    return acc


def loop_int8(h8, f8):
    def body(i, carry):
        acc, h8 = carry
        out = jax.lax.dot_general(
            h8, f8, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        s = jnp.sum(jnp.square(out.astype(jnp.float32))).astype(jnp.int32)
        h8 = h8 + (s % 2).astype(jnp.int8)
        return acc + s, h8

    acc, _ = jax.lax.fori_loop(0, N_ITER, body, (jnp.int32(0), h8))
    return acc


def loop_fp8(h8, f8):
    def body(i, carry):
        acc, h8 = carry
        out = jax.lax.dot_general(
            h8, f8, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = jnp.sum(jnp.square(out))
        h8 = (h8.astype(jnp.float32) + s * 1e-12).astype(h8.dtype)
        return acc + s, h8

    acc, _ = jax.lax.fori_loop(0, N_ITER, body, (jnp.float32(0), h8))
    return acc


def loop_ragged(hT, f3d, sizes):
    def body(i, carry):
        acc, hT = carry
        out = jax.lax.ragged_dot(hT, f3d, sizes,
                                 preferred_element_type=jnp.bfloat16)
        s = jnp.sum(jnp.square(out.astype(jnp.float32)))
        hT = hT + s.astype(jnp.bfloat16) * jnp.bfloat16(1e-12)
        return acc + s, hT

    acc, _ = jax.lax.fori_loop(0, N_ITER, body, (jnp.float32(0), hT))
    return acc


h2_np = rng.randn(R, K, H).astype(np.float32)
h2_bf = jnp.asarray(h2_np, jnp.bfloat16)

results = {}
results["bf16_einsum"] = chain_time("bf16 einsum (baseline)", loop_bf16,
                                    (h_bf, f_bf), (h2_bf, f_bf))

h_i8 = jnp.asarray(np.clip(h_np * 127 / np.abs(h_np).max(), -127, 127)
                   .astype(np.int8))
h2_i8 = jnp.asarray(np.clip(h2_np * 127 / np.abs(h2_np).max(), -127, 127)
                    .astype(np.int8))
f_i8 = jnp.asarray(np.clip(f_np * 127 / np.abs(f_np).max(), -127, 127)
                   .astype(np.int8))
try:
    results["int8_dot"] = chain_time("int8 dot_general (int32 acc)",
                                     loop_int8, (h_i8, f_i8), (h2_i8, f_i8))
except Exception as e:
    print(f"int8: FAILED {type(e).__name__}: {e}", flush=True)

try:
    h_f8 = h_bf.astype(jnp.float8_e4m3fn)
    h2_f8 = h2_bf.astype(jnp.float8_e4m3fn)
    f_f8 = f_bf.astype(jnp.float8_e4m3fn)
    results["fp8_dot"] = chain_time("fp8 e4m3 dot_general (f32 acc)",
                                    loop_fp8, (h_f8, f_f8), (h2_f8, f_f8))
except Exception as e:
    print(f"fp8: FAILED {type(e).__name__}: {e}", flush=True)

hT = jnp.asarray(np.transpose(h_np, (0, 2, 1)).reshape(R * H, K),
                 jnp.bfloat16)
hT2 = jnp.asarray(np.transpose(h2_np, (0, 2, 1)).reshape(R * H, K),
                  jnp.bfloat16)
sizes = jnp.full((R,), H, jnp.int32)
try:
    results["ragged_dot"] = chain_time("ragged_dot grouped", loop_ragged,
                                       (hT, f_bf, sizes), (hT2, f_bf, sizes))

    # one-shot numeric parity vs baseline on a SMALL slice (the full
    # (R*H, F) f32 output is ~2.9 GB — pulling it through the tunnel
    # stalls for tens of minutes)
    rs = 64
    @jax.jit
    def parity(h, f, hTs, sz):
        ref = jnp.einsum("rkh,rkF->rhF", h, f)
        out = jax.lax.ragged_dot(hTs, f, sz,
                                 preferred_element_type=jnp.bfloat16)
        ref = ref.astype(jnp.float32).reshape(rs * H, F)
        out = out.astype(jnp.float32)
        return (jnp.max(jnp.abs(ref - out)), jnp.max(jnp.abs(ref)))

    num, den = parity(h_bf[:rs], f_bf[:rs], hT[: rs * H],
                      jnp.full((rs,), H, jnp.int32))
    err = float(np.asarray(num)) / max(1e-6, float(np.asarray(den)))
    print(f"  ragged_dot rel err vs einsum: {err:.2e}", flush=True)
except Exception as e:
    print(f"ragged_dot: FAILED {type(e).__name__}: {e}", flush=True)

base = results.get("bf16_einsum")
print("\nspeedups vs bf16 einsum:")
for k, v in results.items():
    print(f"  {k:20s} {base / v:5.2f}x")
