from .flat import FlatL2Index, HammingIndex
