"""Command-line entry points (the analog of the reference's tests/*.cpp
executables, RSLightFields/CMakeLists.txt:34-42)."""
