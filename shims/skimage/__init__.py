"""skimage stub: reference generators.py:4 does `from skimage.draw import
circle` but never calls it (grep: single hit). This lets the import succeed
without scikit-image in the image."""
