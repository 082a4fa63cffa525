from ganleaks_tpu.ops.lpips.lpips import (  # noqa: F401
    LPIPS_SHIFT,
    PerceptualLoss,
    LPIPS_SCALE,
    default_lpips_params,
    init_lpips_params,
    load_lpips_params,
    reference_lin_weights,
    lpips_embed,
    lpips_embed_fn,
    lpips_pair,
    normalize_tensor,
    save_lpips_params,
)
