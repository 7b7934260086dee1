"""SIREN geometric pretraining: fit the geo net to a sphere sdf before the
main optimization (reference linear_network_module.py:200-230
pretrain_siren; wired from model.init_setting, basic_trainer.py:60-63).

Functional: takes the model + params, runs a small adam loop on L1 to the
analytic sphere sdf over uniformly sampled points, returns updated params.
"""

import jax
import jax.numpy as jnp
import optax


def pretrain_siren_sphere(
    model,
    variables,
    radius_init=1.0,
    sample_radius=None,
    n_iter=5000,
    lr=1e-4,
    thres=0.01,
    n_pts=5000,
    seed=0,
    logger=None,
):
    """Fit model.forward_pts to sdf(p) = |p| - radius_init.

    Returns updated variables. Uses a jitted scan over fixed-size batches;
    stops early on the host when loss < thres (checked every 250 iters).
    """
    assert radius_init <= 5.0, "sphere too large for stable pretrain"
    sample_radius = sample_radius or radius_init * 2.0

    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, key):
        pts = jax.random.uniform(key, (n_pts, 3), minval=-sample_radius, maxval=sample_radius)
        sdf_gt = jnp.linalg.norm(pts, axis=-1) - radius_init

        def loss_fn(p):
            sdf = model.apply({"params": p}, pts, method="forward_pts")
            return jnp.mean(jnp.abs(sdf - sdf_gt))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    params = variables["params"]
    key = jax.random.PRNGKey(seed)
    loss = None
    for i in range(n_iter):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if (i + 1) % 250 == 0:
            val = float(loss)
            if logger is not None:
                logger.add_log("siren pretrain iter {}: L1 {:.4f}".format(i + 1, val))
            if val < thres:
                break
    new_vars = dict(variables)
    new_vars["params"] = params
    return new_vars
