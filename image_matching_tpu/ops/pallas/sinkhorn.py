"""Fused log-domain Sinkhorn — the whole iteration loop in one Pallas
kernel with the coupling matrix VMEM-resident.

The scan implementation (ops/sinkhorn.log_sinkhorn) re-reads the
(M+1)x(N+1) log-kernel from HBM twice per iteration (row pass + col
pass): at the reference eval config (K=1024, 30 iters, batch 4) that is
~1 GB of HBM traffic for ~60 MFLOP of VPU work — pure bandwidth waste.
Here the matrix is loaded once per batch element, u/v updates run
`iters` times against the VMEM copy, and z + u ⊕ v is written back once:
traffic drops from 2·iters·|Z| to 2·|Z|.

Numerics match ops/sinkhorn.log_sinkhorn exactly (same max-shifted
logsumexp in f32); padding rows/cols carry BIG_NEG mass so the padded
problem is the valid sub-problem (tested). Inference-only: the wrapper
is not differentiable — training keeps the scan path whose VJP XLA
derives (see models/superglue.py gating).

Parity anchor: superglue/models/superglue_test.py:139-153
(log_sinkhorn_iterations) — the reference runs this on GPU via 2·iters
separate torch.logsumexp kernel launches.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BIG_NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sinkhorn_kernel(z_ref, mu_ref, nu_ref, out_ref, *, iters: int):
    z = z_ref[0]  # (Mp, Np) f32, VMEM-resident for the whole loop
    mu = mu_ref[0]  # (Mp, 1)
    nu = nu_ref[0]  # (1, Np)

    def body(_, carry):
        u, v = carry
        t = z + v
        m = jnp.max(t, axis=1, keepdims=True)
        u = mu - (m + jnp.log(jnp.sum(jnp.exp(t - m), axis=1, keepdims=True)))
        t = z + u
        m = jnp.max(t, axis=0, keepdims=True)
        v = nu - (m + jnp.log(jnp.sum(jnp.exp(t - m), axis=0, keepdims=True)))
        return u, v

    u0 = jnp.zeros(mu.shape, jnp.float32)
    v0 = jnp.zeros(nu.shape, jnp.float32)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    out_ref[0] = z + u + v


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def fused_log_sinkhorn(
    z: jax.Array,
    log_mu: jax.Array,
    log_nu: jax.Array,
    iters: int,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.sinkhorn.log_sinkhorn on (B, M, N) inputs.

    Pads M to a multiple of 8 and N to a multiple of 128 (f32 TPU tile)
    with BIG_NEG scores/marginals — exp(BIG_NEG - max) underflows to 0,
    so padding never contributes to a logsumexp.
    """
    assert z.ndim == 3, "fused sinkhorn expects (B, M, N)"
    b, m, n = z.shape
    mp, np_ = _round_up(m, 8), _round_up(n, 128)
    z = z.astype(jnp.float32)
    log_mu = log_mu.astype(jnp.float32)
    log_nu = log_nu.astype(jnp.float32)
    if (mp, np_) != (m, n):
        z = jnp.pad(z, ((0, 0), (0, mp - m), (0, np_ - n)),
                    constant_values=BIG_NEG)
        log_mu = jnp.pad(log_mu, ((0, 0), (0, mp - m)),
                         constant_values=BIG_NEG)
        log_nu = jnp.pad(log_nu, ((0, 0), (0, np_ - n)),
                         constant_values=BIG_NEG)

    out = pl.pallas_call(
        functools.partial(_sinkhorn_kernel, iters=iters),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, mp, np_), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, mp, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, np_), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, mp, np_), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, mp, np_), jnp.float32),
        input_output_aliases={0: 0},  # z buffer becomes the output
        interpret=interpret,
    )(z, log_mu[..., None], log_nu[:, None, :])
    return out[:, :m, :n]
