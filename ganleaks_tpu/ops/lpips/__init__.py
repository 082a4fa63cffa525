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
    lpips_embed_parts,
    lpips_embed_parts_fn,
    lpips_pair,
    normalize_tensor,
    pnet_pair,
    save_lpips_params,
)
from ganleaks_tpu.ops.lpips.train2afc import (  # noqa: F401
    bce_ranking_loss,
    dist2logit,
    init_dist2logit_params,
    lpips_pair_train,
    train_2afc,
)
