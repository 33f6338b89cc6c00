"""Sanity for the device-timing harness."""

import jax.numpy as jnp

from f9tpu.utils.benchtime import measure_op


def test_measure_op_positive_and_ordered():
    big = jnp.ones((512, 2048), jnp.float32)
    t_small = measure_op(lambda a: a * 2.0, big, n=4, repeats=2)
    t_big = measure_op(lambda a: (a @ a.T).sum(axis=1, keepdims=True) * a,
                       big, n=4, repeats=2)
    assert t_small > 0
    assert t_big > t_small  # a matmul costs more than a scale
