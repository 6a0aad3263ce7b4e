from .metadata import H36MMetadata, load_h36m_metadata
from .process import infer_camera_intrinsics
