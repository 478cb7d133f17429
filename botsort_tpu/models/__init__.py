"""Native JAX/Flax implementations of the reference's three neural nets.

The reference executes pretrained ONNX graphs (YOLOX-X detector, FastReID
SBS-S50 body ReID, face-reidentification-retail-0095 face ReID) through
onnxruntime's TensorRT EP. Here the architectures are implemented natively
in Flax and run under jit in bfloat16 on TPU; pretrained weights can be
loaded from orbax checkpoints (see runtime/assets.py) or converted from
the reference ONNX files with tools/import_onnx.py when the `onnx` package
is available.
"""

from botsort_tpu.models.yolox import YOLOX, YOLOX_PRESETS  # noqa: F401
from botsort_tpu.models.fastreid import FastReIDSBS  # noqa: F401
from botsort_tpu.models.facereid import FaceReID  # noqa: F401
