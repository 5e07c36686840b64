"""Host layer: frame loop, readback, output, settings (reference main.cpp
frame loop + ImGui toggle state)."""
