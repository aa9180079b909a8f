"""Per-pass device profiler plumbing (utils/profiler, round 5).

The end-to-end table is validated on hardware (the round-5 --profile
run found the 567 ms transparent-pass bug); these tests lock the
pieces that must not rot: the HLO-metadata scope parser, the capture
hook, and the named scopes actually reaching compiled modules."""

import jax
import jax.numpy as jnp

from prosper_tpu.utils import profiler as prof


def test_scope_map_from_compiled_named_scopes():
    def f(x):
        with jax.named_scope("gbuffer"):
            y = x @ x + 1.0
        with jax.named_scope("shading"):
            z = jnp.sin(y) * 2.0
        return z

    jf = jax.jit(f)
    x = jnp.ones((64, 64))
    txt = jf.lower(x).compile().as_text()
    m = prof.scope_map_from_text(txt)
    assert m, "no op_name metadata parsed from compiled HLO"
    scopes = set(m.values())
    assert "gbuffer" in scopes and "shading" in scopes
    # glue like jit(...)/transpose path components must not become passes
    assert not any(s.startswith("jit(") for s in scopes)


def test_capture_hook_records_and_calls():
    calls = []
    jf = jax.jit(lambda x: x + 1)
    x = jnp.zeros((4,))
    with prof.capture_jit_calls(calls):
        out = prof.profiled_jit_call(jf, x)
    assert float(out[0]) == 1.0
    assert len(calls) == 1 and calls[0][0] is jf
    # outside a capture the hook is pass-through
    out2 = prof.profiled_jit_call(jf, x)
    assert float(out2[0]) == 1.0 and len(calls) == 1


def test_scope_map_for_calls_compiles_captured():
    def g(x):
        with jax.named_scope("taa"):
            return x * 2.0

    jg = jax.jit(g)
    x = jnp.ones((8, 8))
    m = prof.scope_map_for_calls([(jg, (x,), {})])
    assert "taa" in set(m.values())
