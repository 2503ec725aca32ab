"""Numeric ops: the layer below the pipeline drivers.

Analog of the reference's ops/numerics layer (rslf_interpolation.hpp,
rslf_kernels.hpp, rslf_types.hpp) plus the algorithm core
(rslf_depth_computation_core.hpp), re-expressed as dense array ops.
"""
