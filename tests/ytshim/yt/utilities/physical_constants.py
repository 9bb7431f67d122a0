"""kboltz / mh as plain cgs floats (real yt ships them as unyt quantities;
the frontend only multiplies/divides with them)."""

kboltz = 1.38064852e-16  # erg / K
mh = 1.6726219e-24       # g
