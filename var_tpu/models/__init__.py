"""Model factory (reference ``models/__init__.py:9-39``).

``build_vae_var`` derives width = 64*depth, heads = depth,
drop_path = 0.1*depth/24, builds the frozen VQVAE + VAR param pytrees and
returns (configs, params). Published checkpoints load via
``var_tpu.engine.convert``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from var_tpu.config import VAEConfig, VARConfig
from var_tpu.models import quantizer, vae, var


def build_vae_var(
    rng: Optional[jax.Array] = None,
    patch_nums: Tuple[int, ...] = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16),
    V: int = 4096,
    Cvae: int = 32,
    ch: int = 160,
    share_quant_resi: int = 4,
    num_classes: int = 1000,
    depth: int = 16,
    shared_aln: bool = False,
    attn_l2_norm: bool = True,
    init_adaln: float = 0.5,
    init_adaln_gamma: float = 1e-5,
    init_head: float = 0.02,
    init_std: float = -1.0,
    vae_ckpt: Optional[str] = None,
    var_ckpt: Optional[str] = None,
    stack_blocks: bool = True,
):
    """Returns (vae_cfg, var_cfg, vae_params, var_params).

    With ``vae_ckpt``/``var_ckpt`` paths (.pth), loads the published torch
    weights instead of random init (reference train.py:93-98 wget+load flow
    minus the download — zero-egress environment). ``stack_blocks`` stores
    transformer blocks as stacked arrays so forward/decode scan over depth
    (compile time O(1) in depth).
    """
    vae_cfg = VAEConfig(vocab_size=V, z_channels=Cvae, ch=ch,
                        share_quant_resi=share_quant_resi, v_patch_nums=patch_nums)
    var_cfg = VARConfig.from_depth(
        depth, num_classes=num_classes, shared_aln=shared_aln,
        attn_l2_norm=attn_l2_norm, patch_nums=patch_nums,
        vocab_size=V, z_channels=Cvae,
    )
    rng = jax.random.PRNGKey(0) if rng is None else rng
    r1, r2 = jax.random.split(rng)
    # Random-init large models on host CPU when available: initializing a
    # 2B-param model directly on a 16GB chip transiently holds params twice
    # (init + stacked copy) and OOMs. Checkpoint loads are numpy -> no issue.
    import contextlib

    init_ctx = contextlib.nullcontext()
    if depth >= 24 and not var_ckpt:
        try:
            init_ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
        except RuntimeError:
            pass
    if vae_ckpt:
        from var_tpu.engine.convert import convert_vae, load_torch_state_dict

        vae_params = convert_vae(load_torch_state_dict(vae_ckpt), vae_cfg)
    else:
        vae_params = vae.init_vae_params(r1, vae_cfg)
    if var_ckpt:
        from var_tpu.engine.convert import convert_var, load_torch_state_dict

        var_params = convert_var(load_torch_state_dict(var_ckpt), var_cfg)
    else:
        with init_ctx:
            var_params = var.init_var_params(
                r2, var_cfg, init_std=init_std, init_head=init_head,
                init_adaln=init_adaln, init_adaln_gamma=init_adaln_gamma,
            )
    if stack_blocks:
        with init_ctx:
            var_params = var.stack_block_params(var_params)
    return vae_cfg, var_cfg, vae_params, var_params


def from_pretrained_dict(config: dict, state_dict, stack_blocks: bool = True):
    """Build configs + params from a hub-style config dict and state dict —
    the ``VARHF(PyTorchModelHubMixin)`` equivalent (reference
    ``models/var.py:633-653``): config keys are the VARHF ctor kwargs
    (``depth, embed_dim, num_heads, shared_aln, attn_l2_norm, patch_nums,
    num_classes, ...`` plus nested ``vae_kwargs``), the state dict holds
    torch tensors/arrays, with VQVAE weights under ``vae_local.`` when the
    checkpoint bundles the tokenizer.

    Returns (vae_cfg, var_cfg, vae_params_or_None, var_params).
    """
    from var_tpu.engine.convert import convert_var, to_numpy_state_dict

    vk = dict(config.get("vae_kwargs") or {})
    patch_nums = tuple(config.get("patch_nums", vk.get("v_patch_nums",
                                                       (1, 2, 3, 4, 5, 6, 8, 10, 13, 16))))
    vae_cfg = VAEConfig(
        vocab_size=vk.get("vocab_size", 4096),
        z_channels=vk.get("z_channels", 32),
        ch=vk.get("ch", 160),
        share_quant_resi=vk.get("share_quant_resi", 4),
        using_znorm=vk.get("using_znorm", False),
        beta=vk.get("beta", 0.25),
        v_patch_nums=patch_nums,
    )
    depth = config.get("depth", 16)
    var_cfg = VARConfig(
        num_classes=config.get("num_classes", 1000),
        depth=depth,
        embed_dim=config.get("embed_dim", depth * 64),
        num_heads=config.get("num_heads", depth),
        mlp_ratio=config.get("mlp_ratio", 4.0),
        drop_path_rate=config.get("drop_path_rate", 0.0),
        norm_eps=config.get("norm_eps", 1e-6),
        shared_aln=config.get("shared_aln", False),
        cond_drop_rate=config.get("cond_drop_rate", 0.1),
        attn_l2_norm=config.get("attn_l2_norm", False),
        patch_nums=patch_nums,
        vocab_size=vae_cfg.vocab_size,
        z_channels=vae_cfg.z_channels,
    )
    sd = to_numpy_state_dict(state_dict)
    vae_sd = {k[len("vae_local."):]: v for k, v in sd.items()
              if k.startswith("vae_local.")}
    var_sd = {k: v for k, v in sd.items() if not k.startswith("vae_local.")}
    vae_params = None
    if vae_sd:
        from var_tpu.engine.convert import convert_vae

        vae_params = convert_vae(vae_sd, vae_cfg)
    var_params = convert_var(var_sd, var_cfg)
    if stack_blocks:
        var_params = var.stack_block_params(var_params)
    return vae_cfg, var_cfg, vae_params, var_params
