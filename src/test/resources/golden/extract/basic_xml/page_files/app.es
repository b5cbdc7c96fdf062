var x = 1 < 2; // &amp; <tag>
