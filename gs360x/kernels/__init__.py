"""Device kernels: warp/resample, sharpness, optical flow, morphology, voxel.

All kernels are shape-static and jit-friendly. The warp engine replaces
ffmpeg's v360 filter and OpenCV's ``cv2.remap``; sharpness/flow replace the
FrameSelector's OpenCV scoring; voxel ops replace the PlyOptimizer's numpy
scatter math.
"""

from gs360x.kernels.jaxsetup import enable_persistent_cache as _enable_cache

_enable_cache()
del _enable_cache
