"""Pipeline drivers: the analog of the reference's high-level classes
(rslf_depth_computation.hpp: Depth1DComputer, Depth1DComputer_pile,
Depth2DComputer; rslf_fine_to_coarse.hpp: FineToCoarse)."""
