def activation_count(model, inputs, supported_ops=None):
    return {}, {}
