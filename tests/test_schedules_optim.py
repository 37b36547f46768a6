"""OneCycle parity against torch, optimizer groups, freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_vae_tpu.models.vae import param_group_label
from midi_vae_tpu.train.optim import build_optimizer, scale_lr
from midi_vae_tpu.train.schedules import lr_schedule, onecycle_lr, onecycle_momentum


class TestOneCycleTorchParity:
    """Step-for-step equivalence with torch.optim.lr_scheduler.OneCycleLR."""

    @pytest.mark.parametrize("total_steps,max_lr", [(100, 0.01), (57, 0.1)])
    def test_lr_matches_torch(self, total_steps, max_lr):
        import torch

        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=max_lr)
        torch_sched = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr, total_steps=total_steps)
        ours = onecycle_lr(max_lr, total_steps)
        torch_lrs, our_lrs = [], []
        for step in range(total_steps):
            torch_lrs.append(torch_sched.get_last_lr()[0])
            our_lrs.append(float(ours(jnp.int32(step))))
            opt.step()
            torch_sched.step()
        np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-5, atol=1e-9)

    def test_momentum_matches_torch(self):
        import torch

        total_steps = 80
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.01, momentum=0.9)
        torch_sched = torch.optim.lr_scheduler.OneCycleLR(opt, 0.01, total_steps=total_steps)
        ours = onecycle_momentum(total_steps)
        torch_moms, our_moms = [], []
        for step in range(total_steps):
            torch_moms.append(opt.param_groups[0]["momentum"])
            our_moms.append(float(ours(jnp.int32(step))))
            opt.step()
            torch_sched.step()
        np.testing.assert_allclose(our_moms, torch_moms, rtol=1e-5, atol=1e-9)

    def test_named_schedules(self):
        for name in ["OneCycle", "constant", "cosine", "step"]:
            s = lr_schedule(name, 0.01, 100)
            assert np.isfinite(float(s(jnp.int32(5))))
        with pytest.raises(NotImplementedError):
            lr_schedule("plateau", 0.01, 100)  # reference raises too (train.py:239-240)


def test_scale_lr():
    """Linear batch scaling (train.py:199-201)."""
    assert scale_lr(0.01, 128) == pytest.approx(0.01)
    assert scale_lr(0.01, 256) == pytest.approx(0.02)
    assert scale_lr(0.01, 64) == pytest.approx(0.005)


def _toy_params():
    return {
        "encoder": {"kernel": jnp.ones((4, 4))},
        "fc_mu": {"kernel": jnp.ones((4, 2))},
        "decoder": {"kernel": jnp.ones((2, 4))},
        "final_layer": {"kernel": jnp.ones((4, 1))},
    }


class TestBuildOptimizer:
    def test_groups_update_independently(self):
        params = _toy_params()
        bundle = build_optimizer(
            params,
            param_group_label,
            optimizer="SGD",
            lr=1.0,
            lr_encoder_mult=1.0,
            lr_decoder_mult=0.0,  # decoder group LR = 0 → no decoder updates
            scheduler="constant",
            total_steps=10,
            cycle_momentum=False,
        )
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        opt_state = bundle.tx.init(params)
        updates, _ = bundle.tx.update(grads, opt_state, params)
        assert float(jnp.abs(updates["encoder"]["kernel"]).max()) > 0
        assert float(jnp.abs(updates["fc_mu"]["kernel"]).max()) > 0  # heads train with encoder
        assert float(jnp.abs(updates["decoder"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(updates["final_layer"]["kernel"]).max()) == 0.0

    def test_freeze_encoder(self):
        """Encoder freezing (train.py:203-206) zeroes encoder-group updates."""
        params = _toy_params()
        bundle = build_optimizer(
            params,
            param_group_label,
            optimizer="AdamW",
            lr=0.1,
            scheduler="OneCycle",
            total_steps=10,
            freeze_encoder=True,
        )
        assert bundle.frozen_groups == ("encoder",)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        opt_state = bundle.tx.init(params)
        updates, _ = bundle.tx.update(grads, opt_state, params)
        assert float(jnp.abs(updates["encoder"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(updates["fc_mu"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(updates["decoder"]["kernel"]).max()) > 0

    @pytest.mark.parametrize("name", ["AdamW", "Adam", "SGD", "RMSprop", "Adagrad", "LAMB", "Lion"])
    def test_optimizer_names(self, name):
        params = _toy_params()
        bundle = build_optimizer(
            params, param_group_label, optimizer=name, lr=0.01, scheduler="OneCycle", total_steps=10
        )
        opt_state = bundle.tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = bundle.tx.update(grads, opt_state, params)
        assert np.isfinite(float(jnp.abs(updates["decoder"]["kernel"]).max()))

    def test_unknown_optimizer_raises(self):
        with pytest.raises(ValueError):
            build_optimizer(_toy_params(), param_group_label, optimizer="Shampoo2000", total_steps=10)

    def test_sgd_without_momentum_cycle_is_plain_sgd(self):
        """torch.optim.SGD defaults to momentum=0; with the OneCycle
        momentum cycle off, two identical-gradient steps must produce
        identical updates (heavy-ball 0.9 would grow the second one)."""
        params = _toy_params()
        bundle = build_optimizer(
            params,
            param_group_label,
            optimizer="SGD",
            lr=1.0,
            scheduler="constant",
            total_steps=10,
            cycle_momentum=False,
        )
        opt_state = bundle.tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        up1, opt_state = bundle.tx.update(grads, opt_state, params)
        up2, _ = bundle.tx.update(grads, opt_state, params)
        np.testing.assert_allclose(
            np.asarray(up1["decoder"]["kernel"]), np.asarray(up2["decoder"]["kernel"]), rtol=1e-6
        )


def test_frozen_encoder_group_still_logged_at_zero_lr():
    """--freeze-encoder keeps the encoder group in the LR log at 0.0
    (reference logs one LR per param group by name, train.py:735-741)."""
    import jax.numpy as jnp

    from midi_vae_tpu.models.vae import param_group_label
    from midi_vae_tpu.train.optim import build_optimizer

    bundle = build_optimizer(
        None, param_group_label, optimizer="AdamW", lr=0.01,
        scheduler="OneCycle", total_steps=10, freeze_encoder=True,
    )
    assert set(bundle.lr_schedules) == {"encoder", "decoder"}
    assert float(bundle.lr_schedules["encoder"](jnp.int32(5))) == 0.0
    assert float(bundle.lr_schedules["decoder"](jnp.int32(5))) > 0.0
    assert bundle.frozen_groups == ("encoder",)


class TestGradClip:
    """--grad-clip: global-norm clipping, torch clip_grad_norm_ semantics."""

    def _sgd_bundle(self, params, **kw):
        return build_optimizer(
            params,
            param_group_label,
            optimizer="SGD",
            lr=1.0,
            scheduler="constant",
            total_steps=10,
            cycle_momentum=False,
            **kw,
        )

    def test_large_gradients_scaled_to_clip_norm(self):
        params = _toy_params()
        bundle = self._sgd_bundle(params, grad_clip=1.0)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)  # global norm = sqrt(36) = 6
        updates, _ = bundle.tx.update(grads, bundle.tx.init(params), params)
        # SGD lr=1 ⇒ update = -clipped_grad = -(1/6)·grad
        np.testing.assert_allclose(np.asarray(updates["decoder"]["kernel"]), -1.0 / 6.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(updates["encoder"]["kernel"]), -1.0 / 6.0, rtol=1e-6)

    def test_small_gradients_pass_through_unchanged(self):
        params = _toy_params()
        clipped = self._sgd_bundle(params, grad_clip=100.0)
        plain = self._sgd_bundle(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)  # norm 6 << 100
        u_clip, _ = clipped.tx.update(grads, clipped.tx.init(params), params)
        u_plain, _ = plain.tx.update(grads, plain.tx.init(params), params)
        for a, b in zip(jax.tree_util.tree_leaves(u_clip), jax.tree_util.tree_leaves(u_plain)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_frozen_group_excluded_from_global_norm(self):
        """Frozen (encoder-group) gradients must not inflate the norm —
        in torch a frozen param has no .grad at all. Trainable leaves are
        decoder (2x4) + final_layer (4x1): norm = sqrt(12)."""
        params = _toy_params()
        bundle = self._sgd_bundle(params, grad_clip=1.0, freeze_encoder=True)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = bundle.tx.update(grads, bundle.tx.init(params), params)
        assert float(jnp.abs(updates["encoder"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(updates["fc_mu"]["kernel"]).max()) == 0.0  # heads group with encoder
        np.testing.assert_allclose(
            np.asarray(updates["decoder"]["kernel"]), -1.0 / np.sqrt(12.0), rtol=1e-6
        )

    def test_negative_clip_raises(self):
        with pytest.raises(ValueError):
            self._sgd_bundle(_toy_params(), grad_clip=-1.0)
