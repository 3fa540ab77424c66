"""Policy export: direct JAX -> ONNX writer + numpy ONNX interpreter.

Replaces the reference's TensorFlow+tf2onnx export bridge
(reference common/export_onnx.py) with a dependency-free ONNX protobuf
writer that emits the same graph contract: input "obs" (1, obs_size)
float32, baked (x-mean)/std normalization, swish MLP, tanh(loc) head,
output "continuous_actions", opset 11.
"""
