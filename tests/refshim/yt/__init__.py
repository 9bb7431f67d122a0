"""Minimal `yt` namespace for running the reference package in this image
(only `yt.utilities.cosmology.Cosmology` is imported on the model-build
path — reference radial_profiles.py:307, :783, :810).  Test infra only."""
