from .boxes import (
    get_bounding_box,
    crop_with_bbox,
    bounding_box_batch,
)
from .sampling import (
    get_area_sampling_dist,
    get_pid_sampling_dist,
    parallel_data_prefetch,
)
from .misc import prepare_input, scale_img, valid_joints
