from ganleaks_tpu.io.images import (  # noqa: F401
    get_filepaths_from_dir,
    load_image_dir,
    nearest_resize,
    read_image,
    read_image_center_crop,
    save_png,
    to_uint8,
)
from ganleaks_tpu.io.npz import (  # noqa: F401
    find_npz_files,
    load_npz_images,
    resolve_input_format,
)
from ganleaks_tpu.io.artifacts import (  # noqa: F401
    check_folder,
    dump_params,
    save_files,
    timestamp_dir,
    write_synthetic_artifacts,
)
