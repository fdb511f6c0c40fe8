"""Network parity tests: random-init reference torch modules vs arah_tpu
functional modules with converted weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import add_reference_path, load_ref_siren_modules

add_reference_path()

import torch  # noqa: E402

from arah_tpu.nn.color import ColorConfig, color_apply, init_color  # noqa
from arah_tpu.nn.hypernet import (HypernetConfig, hypernet_cond,  # noqa
                                  hypernet_generate, init_hypernet)
from arah_tpu.nn.pose_encoder import pose_encoder_apply  # noqa
from arah_tpu.nn.siren import siren_apply  # noqa
from arah_tpu.nn.skinning import (SkinningConfig, init_skinning,  # noqa
                                  skinning_logits, skinning_weights)
from arah_tpu.train.checkpoints import (convert_hypernet,  # noqa
                                        convert_pose_encoder, convert_wn_mlp)


def sd_numpy(module, prefix=''):
    return {prefix + k: v.detach().numpy()
            for k, v in module.state_dict().items()}


class TestPoseEncoder:
    @pytest.mark.parametrize('rel_joints', [False, True])
    def test_parity(self, rng, rel_joints):
        siren, _ = load_ref_siren_modules()
        torch.manual_seed(0)
        ref = siren.HierarchicalPoseEncoder(rel_joints=rel_joints)
        params = convert_pose_encoder(sd_numpy(ref), '')
        rots = rng.randn(2, 24, 9).astype(np.float32)
        Jtrs = rng.randn(2, 24, 3).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.tensor(rots), torch.tensor(Jtrs)).numpy()
        out = np.asarray(pose_encoder_apply(
            params, jnp.asarray(rots), jnp.asarray(Jtrs),
            rel_joints=rel_joints))
        np.testing.assert_allclose(out, out_ref, atol=2e-5)


class TestHypernet:
    def test_parity_film(self, rng):
        siren, _ = load_ref_siren_modules()
        torch.manual_seed(0)
        ref = siren.HyperBVPNet(out_features=1, type='sine', in_features=3,
                                hyper_in_ch=144, hidden_features=256,
                                num_hidden_layers=5, hierarchical_pose=True,
                                use_FiLM=True)
        cfg = HypernetConfig(in_features=3, out_features=1,
                             hidden_features=256, num_hidden_layers=5,
                             hyper_in_ch=144, use_film=True,
                             hierarchical_pose=True)
        params = convert_hypernet(sd_numpy(ref), cfg, prefix='')

        rots = rng.randn(1, 24, 9).astype(np.float32)
        Jtrs = rng.randn(1, 24, 3).astype(np.float32)
        latent = rng.randn(1, 128).astype(np.float32)
        coords = (rng.rand(1, 64, 3).astype(np.float32) - 0.5) * 2

        with torch.no_grad():
            out_ref = ref({'coords': torch.tensor(coords),
                           'rots': torch.tensor(rots),
                           'Jtrs': torch.tensor(Jtrs),
                           'latent': torch.tensor(latent)})
        cond = hypernet_cond(params, cfg, jnp.asarray(rots),
                             jnp.asarray(Jtrs))[0]
        gen = hypernet_generate(params, cfg, cond, jnp.asarray(latent)[0])
        out = np.asarray(siren_apply(gen, jnp.asarray(coords[0])))
        np.testing.assert_allclose(
            out, out_ref['model_out'][0].numpy(), atol=5e-5)
        # generated per-layer weights match too
        for i, p_ref in enumerate(out_ref['params']):
            ours = np.asarray(gen.weights[i]).reshape(-1)
            np.testing.assert_allclose(ours, p_ref.numpy().reshape(-1),
                                       atol=2e-5)

    def test_parity_no_film(self, rng):
        siren, _ = load_ref_siren_modules()
        torch.manual_seed(1)
        ref = siren.HyperBVPNet(out_features=1, type='sine', in_features=3,
                                hyper_in_ch=144, hidden_features=256,
                                num_hidden_layers=5, hierarchical_pose=True,
                                use_FiLM=False)
        cfg = HypernetConfig(use_film=False)
        params = convert_hypernet(sd_numpy(ref), cfg, prefix='')
        rots = rng.randn(1, 24, 9).astype(np.float32)
        Jtrs = rng.randn(1, 24, 3).astype(np.float32)
        coords = (rng.rand(1, 32, 3).astype(np.float32) - 0.5) * 2
        with torch.no_grad():
            out_ref = ref({'coords': torch.tensor(coords),
                           'rots': torch.tensor(rots),
                           'Jtrs': torch.tensor(Jtrs)})
        cond = hypernet_cond(params, cfg, jnp.asarray(rots),
                             jnp.asarray(Jtrs))[0]
        gen = hypernet_generate(params, cfg, cond, None)
        out = np.asarray(siren_apply(gen, jnp.asarray(coords[0])))
        np.testing.assert_allclose(out, out_ref['model_out'][0].numpy(),
                                   atol=5e-5)


class TestDeformer:
    def test_parity(self, rng):
        import importlib
        decoder_mod = importlib.import_module(
            'im2mesh.metaavatar.models.decoder')
        torch.manual_seed(0)
        ref = decoder_mod.Deformer(d_in=3, d_out=25, d_hidden=128,
                                   n_layers=4, skip_in=[], cond_in=[],
                                   multires=0, bias=1.0,
                                   geometric_init=False, weight_norm=True)
        cfg = SkinningConfig()
        params = {'layers': convert_wn_mlp(sd_numpy(ref), '',
                                           cfg.n_layers + 1)}
        pts = rng.randn(1, 64, 3).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.tensor(pts),
                          torch.empty(1, 0)).numpy()
        out = np.asarray(skinning_logits(params, cfg,
                                         jnp.asarray(pts[0])))
        np.testing.assert_allclose(out, out_ref[0], atol=2e-5)

    def test_weights_normalized(self, rng):
        cfg = SkinningConfig()
        params = init_skinning(jax.random.PRNGKey(0), cfg)
        w = skinning_weights(params, cfg,
                             jnp.asarray(rng.randn(32, 3), jnp.float32))
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


class TestColorNetwork:
    @pytest.mark.parametrize('mode,pose_enc', [
        ('idr', 'latent'), ('no_view_dir', None), ('idr', 'leap'),
    ])
    def test_parity(self, rng, mode, pose_enc):
        import importlib
        decoder_mod = importlib.import_module(
            'im2mesh.metaavatar_render.models.decoder')
        from arah_tpu.nn.color import feature_width, color_pose_feature
        torch.manual_seed(0)
        d_feature = feature_width(pose_enc)
        d_in = {'idr': 9, 'no_view_dir': 6, 'no_normal': 6}[mode]
        # view-dir PE only makes sense when view dirs are inputs (the
        # reference errors out on no_view_dir + multires_view > 0)
        mrv = 4 if mode != 'no_view_dir' else 0
        ref = decoder_mod.RenderingNetwork(
            d_feature=d_feature, mode=mode, d_in=d_in, d_out=3, d_hidden=256,
            n_layers=5, weight_norm=True, multires=0, multires_view=mrv,
            skips=[3], squeeze_out=True, pose_encoder=pose_enc)
        cfg = ColorConfig(d_feature=d_feature, mode=mode, d_in=d_in,
                          n_layers=5, multires_view=mrv, skips=(3,),
                          pose_encoder=pose_enc)
        params = {'layers': convert_wn_mlp(sd_numpy(ref), '',
                                           cfg.n_layers + 1)}
        if pose_enc == 'leap':
            params['pose_encoder'] = convert_pose_encoder(
                sd_numpy(ref.pose_encoder), '')

        n = 32
        pts = rng.randn(n, 3).astype(np.float32)
        normals = rng.randn(n, 3).astype(np.float32)
        views = rng.randn(n, 3).astype(np.float32)
        feats = rng.randn(n, 256).astype(np.float32)
        pose_cond_np = {
            'rots_full': rng.randn(1, 24, 9).astype(np.float32),
            'Jtrs_posed': rng.randn(1, 24, 3).astype(np.float32),
            'latent_code': rng.randn(1, 128).astype(np.float32),
        }
        pose_cond_t = {k: torch.tensor(v) for k, v in pose_cond_np.items()}
        with torch.no_grad():
            out_ref = ref(torch.tensor(pts), torch.tensor(normals),
                          torch.tensor(views), torch.tensor(feats),
                          pose_cond_t).numpy()
        pose_cond_j = {k: jnp.asarray(v) for k, v in pose_cond_np.items()}
        pf = color_pose_feature(params, cfg, pose_cond_j)
        out = np.asarray(color_apply(params, cfg, jnp.asarray(pts),
                                     jnp.asarray(normals), jnp.asarray(views),
                                     jnp.asarray(feats), pf))
        np.testing.assert_allclose(out, out_ref, atol=2e-5)


class TestSdfMlp:
    def test_parity_geo_mlp(self, rng):
        """IDR-style SDFNetwork ('geo_mlp') parity vs reference."""
        import importlib
        decoder_mod = importlib.import_module(
            'im2mesh.metaavatar.models.decoder')
        from arah_tpu.nn.sdf_mlp import (SdfMlpConfig, sdf_mlp_apply)
        from arah_tpu.train.checkpoints import convert_pose_encoder
        torch.manual_seed(0)
        ref = decoder_mod.SDFNetwork(
            d_in=3, d_out=129, d_hidden=128, n_layers=4, skip_in=[2],
            cond_in=[0], multires=4, bias=0.5, scale=1.0,
            geometric_init=True, weight_norm=True, inside_outside=False)
        cfg = SdfMlpConfig(d_in=3, d_out=129, d_hidden=128, n_layers=4,
                           skip_in=(2,), cond_in=(0,), multires=4,
                           bias=0.5, scale=1.0)
        from arah_tpu.train.checkpoints import convert_wn_mlp
        params = {'layers': convert_wn_mlp(sd_numpy(ref), '', 5),
                  'pose_encoder': convert_pose_encoder(
                      sd_numpy(ref.pose_encoder), '')}
        pts = rng.randn(1, 32, 3).astype(np.float32) * 0.5
        rots = rng.randn(1, 24, 9).astype(np.float32)
        Jtrs = rng.randn(1, 24, 3).astype(np.float32)
        with torch.no_grad():
            out_ref = ref({'coords': torch.tensor(pts),
                           'rots': torch.tensor(rots),
                           'Jtrs': torch.tensor(Jtrs)}).numpy()
        out = np.asarray(sdf_mlp_apply(
            params, cfg, jnp.asarray(pts[0]), jnp.asarray(rots),
            jnp.asarray(Jtrs)))
        np.testing.assert_allclose(out, out_ref[0], atol=3e-5)


class TestPretrainedBootstraps:
    def test_metaavatar_hypo_init_identity(self, rng):
        """With zero-init hyper heads, the generated SIREN must equal the
        pretrained MetaAvatar weights loaded into hypo_init (the reference
        bootstrap contract, `hyperlayers.py:315-342,418-423`)."""
        from arah_tpu.nn.hypernet import (HypernetConfig, init_hypernet,
                                          hypernet_generate, hypernet_cond,
                                          siren_layer_dims)
        from arah_tpu.train.checkpoints import load_metaavatar_hypo_init
        cfg = HypernetConfig(hidden_features=32, num_hidden_layers=2,
                             use_film=False)
        params = init_hypernet(jax.random.PRNGKey(0), cfg)
        # fake MetaAvatar ckpt state dict
        sd = {}
        dims = siren_layer_dims(cfg)
        expect = []
        for i, (d_in, d_out) in enumerate(dims):
            w = rng.randn(d_out, d_in).astype(np.float32)
            b = rng.randn(d_out).astype(np.float32)
            sd[f'decoder.net.net.{i}.0.weight'] = w
            sd[f'decoder.net.net.{i}.0.bias'] = b
            expect.append((w, b))
        params['hypo_init'] = load_metaavatar_hypo_init(sd, cfg)

        cond = hypernet_cond(params, cfg,
                             jnp.asarray(rng.randn(1, 24, 9),
                                         jnp.float32),
                             jnp.asarray(rng.randn(1, 24, 3),
                                         jnp.float32))[0]
        gen = hypernet_generate(params, cfg, cond, None)
        for i, (w, b) in enumerate(expect):
            np.testing.assert_allclose(np.asarray(gen.weights[i]), w,
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(gen.biases[i]), b,
                                       atol=1e-6)

    def test_snarf_skinning_load(self, rng):
        """SNARF fwd-skinning ckpt load (`metaavatar_render/config.py:77-89`
        contract: `skinning_decoder_fwd.` prefix, weight-normed lin layers).
        """
        from arah_tpu.nn.skinning import (SkinningConfig, skinning_logits)
        from arah_tpu.train.checkpoints import load_snarf_skinning
        cfg = SkinningConfig(d_hidden=32, n_layers=2)
        sd = {}
        dims = [3, 32, 32, 25]
        for l in range(3):
            v = rng.randn(dims[l + 1], dims[l]).astype(np.float32)
            g = np.abs(rng.randn(dims[l + 1], 1)).astype(np.float32)
            sd[f'skinning_decoder_fwd.lin{l}.weight_v'] = v
            sd[f'skinning_decoder_fwd.lin{l}.weight_g'] = g
            sd[f'skinning_decoder_fwd.lin{l}.bias'] = \
                rng.randn(dims[l + 1]).astype(np.float32)
        params = load_snarf_skinning(sd, cfg.n_layers)
        out = skinning_logits(params, cfg,
                              jnp.asarray(rng.randn(8, 3), jnp.float32))
        assert out.shape == (8, 25)
        assert np.isfinite(np.asarray(out)).all()


class TestBf16Storage:
    """bf16_shading stores inter-layer activations in bfloat16
    (`siren_apply`/`color_apply`); the stored rounding must stay at the
    bf16 operand-rounding scale the matmuls already carry, and the jacfwd
    tangent chain (shading normals) must ride the same dtype."""

    def test_siren_bf16_storage_close_and_tangent_dtype(self, rng):
        from arah_tpu.nn.siren import (init_plain_siren,
                                       plain_siren_as_generated)
        gen = plain_siren_as_generated(
            init_plain_siren(jax.random.PRNGKey(0), [3, 64, 64, 64, 1]))
        x = jnp.asarray(rng.randn(32, 3), jnp.float32) * 0.5
        o32, f32_feat = siren_apply(gen, x, return_features=True)
        o16, f16_feat = siren_apply(gen, x, return_features=True, bf16=True)
        assert f16_feat.dtype == jnp.bfloat16
        assert o16.dtype == jnp.float32          # f32 accumulation out
        # activations are O(1) (sine outputs); bf16 storage keeps the
        # result within a few bf16 ulps through 3 hidden layers
        assert float(jnp.abs(o32 - o16).max()) < 3e-2
        # normals: forward-mode input gradient through the bf16 chain
        g = jax.vmap(jax.jacfwd(
            lambda p: siren_apply(gen, p[None], bf16=True)[0, 0]))(x)
        g32 = jax.vmap(jax.jacfwd(
            lambda p: siren_apply(gen, p[None])[0, 0]))(x)
        assert g.dtype == jnp.float32
        assert np.isfinite(np.asarray(g)).all()
        # floored denominator: a near-zero g32 would otherwise turn this
        # into a 0/0-style flake instead of a meaningful tolerance
        denom = max(float(jnp.abs(g32).max()), 1e-3)
        assert float(jnp.abs(g - g32).max()) / denom < 5e-2

    def test_color_bf16_storage_close(self, rng):
        cfg = ColorConfig(d_feature=64 + 128, d_hidden=64, pose_encoder='latent')
        params = init_color(jax.random.PRNGKey(1), cfg)
        n = 16
        pts = jnp.asarray(rng.randn(n, 3), jnp.float32)
        nrm = jnp.asarray(rng.randn(n, 3), jnp.float32)
        vd = jnp.asarray(rng.randn(n, 3), jnp.float32)
        feat = jnp.asarray(rng.randn(n, 64), jnp.float32)
        pose = jnp.asarray(rng.randn(1, 128), jnp.float32)
        rgb32 = color_apply(params, cfg, pts, nrm, vd, feat, pose)
        rgb16 = color_apply(params, cfg, pts, nrm, vd, feat, pose, bf16=True)
        assert rgb16.dtype == jnp.float32
        assert float(jnp.abs(rgb32 - rgb16).max()) < 2e-2


class TestColorFoldInput:
    def test_fold_matches_concat_path(self, rng):
        """ColorConfig.fold_input: layer-0/skip input concat folded into
        column-sliced partial matmuls must match the concat path to
        partial-sum reassociation noise (values and grads)."""
        import jax
        import jax.numpy as jnp
        from arah_tpu.nn.color import ColorConfig, color_apply, init_color

        cfg = ColorConfig(d_feature=384, d_hidden=128, n_layers=4,
                          skips=(2,), pose_encoder='latent')
        params = init_color(jax.random.PRNGKey(0), cfg)
        N = 256
        pts = jnp.asarray(rng.randn(N, 3).astype(np.float32))
        nrm = jnp.asarray(rng.randn(N, 3).astype(np.float32))
        vd = jnp.asarray(rng.randn(N, 3).astype(np.float32))
        ft = jnp.asarray(rng.randn(N, 256).astype(np.float32))
        pf = jnp.asarray(rng.randn(128).astype(np.float32))

        def f(p, fold):
            return color_apply(p, cfg._replace(fold_input=fold),
                               pts, nrm, vd, ft, pf)

        np.testing.assert_allclose(np.asarray(f(params, False)),
                                   np.asarray(f(params, True)),
                                   atol=1e-6)
        ga = jax.grad(lambda p: jnp.sum(f(p, False) ** 2))(params)
        gb = jax.grad(lambda p: jnp.sum(f(p, True) ** 2))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            ga, gb)


class TestColorFused:
    """Fused Pallas color pair (ops/pallas/color_kernel.py) vs the plain
    XLA concat path: values and every gradient leaf (weight-norm g/v/b
    plus all tensor inputs), driven through color_apply's dispatch gate
    (ARAH_FORCE_PALLAS -> interpret mode on CPU). n=196 with tile 64
    exercises the padding path in both kernels."""

    def _check(self, cfg, rng, monkeypatch, n=196, d_sdf=64, bf16=False,
               atol=2e-5, gtol=1e-4, gatol=2e-5):
        monkeypatch.setenv('ARAH_FORCE_PALLAS', '1')
        params = init_color(jax.random.PRNGKey(0), cfg)
        pts = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        nrm = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        vd = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        ft = jnp.asarray(rng.randn(n, d_sdf).astype(np.float32))
        P = cfg.d_feature - d_sdf
        pf = jnp.asarray(rng.randn(1, P).astype(np.float32)) if P else None
        cot = jnp.asarray(rng.randn(n, cfg.d_out).astype(np.float32))

        def f(p, a, use):
            c = cfg._replace(use_pallas=use, pallas_tile=64,
                             pallas_tile_bwd=64)
            return color_apply(p, c, a[0], a[1], a[2], a[3], a[4],
                               bf16=bf16)

        args = (pts, nrm, vd, ft, pf)
        ref = f(params, args, False)
        out = f(params, args, True)
        assert out.shape == (n, cfg.d_out)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=atol)

        loss = lambda p, a, use: jnp.sum(f(p, a, use) * cot)  # noqa: E731
        gref = jax.grad(loss, argnums=(0, 1))(params, args, False)
        gker = jax.grad(loss, argnums=(0, 1))(params, args, True)
        for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(gker)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-3)
            assert np.abs(a - b).max() / scale < gtol \
                or np.abs(a - b).max() < gatol, (a.shape,)

    def test_idr_latent_skip(self, rng, monkeypatch):
        cfg = ColorConfig(d_feature=64 + 128, d_hidden=128, n_layers=4,
                          skips=(2,), pose_encoder='latent')
        self._check(cfg, rng, monkeypatch)

    def test_no_view_dir_no_pose(self, rng, monkeypatch):
        # d_in = points + normals only; no view-dir PE in this mode
        cfg = ColorConfig(d_feature=64, d_hidden=64, n_layers=3, d_in=6,
                          multires_view=0, skips=(2,), pose_encoder=None,
                          mode='no_view_dir')
        self._check(cfg, rng, monkeypatch)

    def test_no_normal_multires_no_squeeze(self, rng, monkeypatch):
        # d_in = points + view dirs; PE on both (multires 2 / view 4)
        cfg = ColorConfig(d_feature=64 + 12, d_hidden=64, n_layers=3,
                          d_in=6, skips=(2,), pose_encoder='root',
                          mode='no_normal', multires=2, squeeze_out=False)
        self._check(cfg, rng, monkeypatch, gtol=2e-4)

    def test_no_skip(self, rng, monkeypatch):
        cfg = ColorConfig(d_feature=64 + 128, d_hidden=64, n_layers=3,
                          skips=(), pose_encoder='latent')
        self._check(cfg, rng, monkeypatch)

    def test_bf16(self, rng, monkeypatch):
        """bf16 operands / f32 accumulation: the fused kernel rounds one
        storage step FEWER than the XLA bf16 path (activations stay f32
        in VMEM), so compare both against the f32 reference."""
        monkeypatch.setenv('ARAH_FORCE_PALLAS', '1')
        cfg = ColorConfig(d_feature=64 + 128, d_hidden=128, n_layers=4,
                          skips=(2,), pose_encoder='latent',
                          pallas_tile=64, pallas_tile_bwd=64)
        params = init_color(jax.random.PRNGKey(0), cfg)
        n = 128
        pts = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        nrm = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        vd = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        ft = jnp.asarray(rng.randn(n, 64).astype(np.float32))
        pf = jnp.asarray(rng.randn(1, 128).astype(np.float32))
        f32 = color_apply(params, cfg._replace(use_pallas=False),
                          pts, nrm, vd, ft, pf)
        fused16 = color_apply(params, cfg, pts, nrm, vd, ft, pf, bf16=True)
        assert fused16.dtype == jnp.float32
        assert float(jnp.abs(f32 - fused16).max()) < 2e-2
