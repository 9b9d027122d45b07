"""The reference test scenarios: (spec dict, rows, expected golden file).

Mirrors /root/reference/test/test_template_processor.py:11-510 — the mapping
specs and fixture rows that drive the 27 golden Turtle files. Kept as data so
both the driver evaluator (pyeval) and the Spark compiler run the SAME suite.
"""

ROW1 = {"x": "foo", "y": "bar", "id": "123",
        "croplink": [{"crop": "barley", "qualifier": "winter"}],
        "label": "label1"}
ROW2 = {"id": "456", "label": "label2"}
ROW3 = {"id": "789", "label": "label1"}
ROW4 = {"id": "444", "flag": "n"}
ROW5 = {"id": "555", "flag": "y"}

TESTDS = {"$datasetID": "testds"}

# name -> (spec_dict, auto_declare, rows, golden_file)
GOLDEN_CASES = {
    "default_mapping": (
        {"globals": TESTDS,
         "resources": [{"name": "registration", "properties": [{"id": ""}]}]},
        True, [ROW1], "default_mapping.ttl"),
    "default_mapping_no_auto_declare": (
        {"globals": TESTDS,
         "resources": [{"name": "registration", "properties": [{"id": ""}]}]},
        False, [ROW1], "default_mapping_no_auto_declare.ttl"),
    "explicit_mapping": (
        {"globals": TESTDS,
         "resources": [{"name": "registration", "properties": {
             "@id": "<http://example.com/{$row}>",
             "@type": "<skos:Concept>",
             "p": "{id | asInt}"}}]},
        True, [ROW1], "explicit_mapping.ttl"),
    "skip_missing": (
        {"globals": TESTDS,
         "namespaces": {"def": "https://epimorphics.com/library/def/"},
         "resources": [{"name": "registration", "properties": {
             "@id": "<http://example.com/{$row}>",
             "@type": "<skos:Concept>",
             "<def:p>": "{id | asInt}",
             "<def:missing>": "{missing}",
             "<def:missing2>": "{missing}@en",
             "<def:missing3>": "{missing|asInt}"}}]},
        True, [ROW1], "skip_missing.ttl"),
    "skip_missing_in_list": (
        {"globals": TESTDS,
         "namespaces": {"def": "https://epimorphics.com/library/def/"},
         "resources": [{"name": "registration", "properties": {
             "@id": "<http://example.com/{$row}>",
             "@type": "<skos:Concept>",
             "<def:missing>": ["{missing}", "{id}"]}}]},
        True, [ROW1], "skip_missing_in_list.ttl"),
    "inverse_prop": (
        {"globals": TESTDS,
         "resources": [{"name": "registration", "properties": {
             "@id": "<http://example.com/{$row}>",
             "@type": "<skos:Concept>",
             "p": "{id | asInt}",
             "^<skos:member>": "<http://example.com/collection>"}}]},
        True, [ROW1], "inverse_prop.ttl"),
    "property_spec": (
        {"globals": TESTDS,
         "namespaces": {"aglib": "https://epimorphics.com/library/def/"},
         "properties": [{"name": "regNo",
                         "comment": "identifier for registration",
                         "prop": "<aglib:RegNo>", "class": "<aglib:Reg>",
                         "type": "Int"}],
         "resources": [{"name": "registration",
                        "properties": {":regNo": "{id}"}}]},
        True, [ROW1], "property_spec.ttl"),
    "embedded_template": (
        {"globals": TESTDS,
         "namespaces": {"aglib": "https://epimorphics.com/library/def/"},
         "resources": [{"name": "registration", "properties": {
             "regNo": "{id}",
             "crop-link": "{croplink | map_to('crop-situation')}"}}],
         "embedded": [{"name": "crop-situation", "properties": {
             "@id": "<parent>",
             "crop": "{crop}",
             "qualifier": "{qualifier}"}}]},
        True, [ROW1], "embedded_template.ttl"),
    "embedded_literal_template": (
        {"globals": TESTDS,
         "namespaces": {"aglib": "https://epimorphics.com/library/def/"},
         "resources": [{"name": "registration", "properties": {
             "regNo": "{id}",
             "crop-situation": "{croplink | map_to('crop-situation')}"}}],
         "embedded": [{"name": "crop-situation",
                       "pattern": "{crop} ({qualifier})@en"}]},
        True, [ROW1], "embedded_literal_template.ttl"),
    "one_off": (
        {"globals": TESTDS,
         "one_offs": [{"name": "HSE", "properties": {
             "@id": "<HSE>",
             "@type": "<org:Organization>",
             "<skos:prefLabel>": "Health and Safety Executive@en"}}]},
        True, [ROW1], "one_off.ttl"),
    "auto_cv": (
        {"globals": TESTDS,
         "resources": [{"name": "registration", "properties": {
             "@id": "<http://example.com/{id}>",
             "prop": "{label | autoCV('scheme1','label')}"}}]},
        True, [ROW1, ROW2, ROW3], "auto_cv.ttl"),
    "auto_cv_hash": (
        {"globals": TESTDS,
         "resources": [{"name": "registration", "properties": {
             "@id": "<http://example.com/{id}>",
             "prop": "{label | autoCV('scheme1','hash')}"}}]},
        True, [ROW1, ROW2, ROW3], "auto_cv_hash.ttl"),
    "property_value_list": (
        {"globals": TESTDS,
         "resources": [{"name": "registration", "properties": {
             "@id": "<http://example.com/{id}>",
             "prop": ["<http://example.com/value/{x}>", "{y}"]}}]},
        True, [ROW1], "property_value_list.ttl"),
    "nested_resource_spec": (
        {"globals": TESTDS,
         "resources": [{"name": "registration", "properties": {
             "@id": "<http://example.com/{id}>",
             "prop": {"name": "nested",
                      "properties": {"@id": "<_>", "val": "{x}"}}}}]},
        True, [ROW1], "nested_resource_spec.ttl"),
    "nested_literal_resource_spec": (
        {"globals": TESTDS,
         "resources": [{"name": "registration", "properties": {
             "@id": "<http://example.com/{id}>",
             "prop": {"name": "nested", "pattern": "{x}@en"}}}]},
        True, [ROW1], "nested_literal_resource_spec.ttl"),
    "map_by": (
        {"mappings": {"testmap": {"foo": "<http://example.com/Foo>",
                                  "bar": "<http://example.com/Bar>",
                                  "baz": "<http://example.com/Baz>"}},
         "resources": [{"name": "registration", "properties": {
             "@id": "<http://example.com/{id}>",
             "p": "{x | map_by('testmap')}",
             "q": "{y | map_by('testmap')}"}}]},
        False, [ROW1], "map_by.ttl"),
    "required_filter": (
        {"resources": [{"name": "Test", "requires": {"id": "123"},
                        "properties": {"@id": "<http://example.com/{id}>",
                                       "@type": "<http://example.com/File>"}}]},
        False, [ROW1, ROW2], "required_filter.ttl"),
    "required_in_filter": (
        {"resources": [{"name": "Test", "requires": {"id": ["123", "789"]},
                        "properties": {"@id": "<http://example.com/{id}>",
                                       "@type": "<http://example.com/File>"}}]},
        False, [ROW1, ROW2], "required_filter.ttl"),
    "unless_filter": (
        {"resources": [{"name": "Test", "unless": {"id": "123"},
                        "properties": {"@id": "<http://example.com/{id}>",
                                       "@type": "<http://example.com/File>"}}]},
        False, [ROW1, ROW2], "unless_filter.ttl"),
    "unless_none_filter": (
        {"resources": [{"name": "Test", "unless": {"x": None},
                        "properties": {"@id": "<http://example.com/{id}>",
                                       "@type": "<http://example.com/File>"}}]},
        False, [ROW1, ROW2, {"id": "789", "x": "", "label": "label1"}],
        "unless_none_filter.ttl"),
    "required_none_filter": (
        {"resources": [{"name": "Test", "requires": {"x": None},
                        "properties": {"@id": "<http://example.com/{id}>",
                                       "@type": "<http://example.com/File>"}}]},
        False, [ROW1, ROW2], "required_filter.ttl"),
    "unless_in_filter": (
        {"resources": [{"name": "Test", "unless": {"id": ["123", "789"]},
                        "properties": {"@id": "<http://example.com/{id}>",
                                       "@type": "<http://example.com/File>"}}]},
        False, [ROW1, ROW2, ROW3], "unless_filter.ttl"),
    "asBoolean_producing_false": (
        {"resources": [{"name": "Test", "properties": {
            "@id": "<http://example.com/{id}>",
            "p": "{flag|asBoolean('y')}"}}]},
        False, [{"id": "123", "flag": "n"}, {"id": "456", "flag": "y"}],
        "asBoolean_producing_false.ttl"),
    "langString_quoted_value": (
        {"resources": [{"name": "Test", "properties": {
            "@id": "<http://example.com/{id}>",
            "p": "{label}@en"}}]},
        False, [{"id": "123", "label": '"A quoted value"'}],
        "langString_quoted_value.ttl"),
    "langString_with_newline": (
        {"resources": [{"name": "Test", "properties": {
            "@id": "<http://example.com/{id}>",
            "p": "{label}@en"}}]},
        False, [{"id": "123", "label": "A value with a newline\nin it"}],
        "langString_with_newline.ttl"),
    "split_in_fn_pipeline": (
        {"resources": [{"name": "Test", "properties": {
            "@id": "<http://example.com/{id}>",
            "p": "{label | split(',') | slug}"}}]},
        False, [{"id": "123", "label": "Value 1, Value 2"}],
        "split_in_fn_pipeline.ttl"),
    "split_in_url_pattern": (
        {"resources": [{"name": "Test", "properties": {
            "@id": "<http://example.com/{id}>",
            "p": "<http://example.com/{label | splitComma}>"}}]},
        False, [{"id": "123", "label": "value1, value2"}],
        "split_in_url_pattern.ttl"),
    "smap_to": (
        {"resources": [{"name": "registration", "properties": {
            "@id": "<http://example.com/{id}>",
            "@type": "<skos:Concept>",
            "p": "{croplink | smap_to('crop-situation')}"}}],
         "embedded": [{"name": "crop-situation", "requires": {"crop": None},
                       "pattern": "{crop} ({qualifier})@en"}]},
        False, [ROW1], "smap_to.ttl"),
    "guard_condition": (
        {"resources": [{"name": "Test",
                        "guard": "'x' in locals() and x == 'foo'",
                        "properties": {"@id": "<http://example.com/{id}>",
                                       "p": "{x}"}}]},
        False, [ROW1, ROW2], "guard_condition.ttl"),
    "guard_condition_false": (
        {"resources": [{"name": "Test", "guard": "label == 'foo'",
                        "properties": {"@id": "<http://example.com/{id}>",
                                       "p": "{x}"}}]},
        False, [ROW2], "guard_condition_false.ttl"),
}

GRAPHS_SPEC = {
    "namespaces": {"ex": "http://example.com/"},
    "resources": [
        {"name": "Base", "@graph": "<http://example.com/base>",
         "properties": {"@id": "<http://example.com/{id}>",
                        "<rdfs:label>": "{label}",
                        "<ex:value>": "{value}"}},
        {"name": "Current", "@graphAdd": "<http://example.com/current>",
         "properties": {"@id": "<http://example.com/{id}>",
                        "<ex:latest_value>": "{value}"}},
    ],
}

GRAPHS_ROWS = [
    {"id": "12", "label": "label1", "value": 42},
    {"id": "34", "label": "label2", "value": 35},
    {"id": "56", "label": "label3", "value": 451},
]
